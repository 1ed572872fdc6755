"""probe20 — dispatch-free cost of the full VP eval and its glue variants.

bench_round's vp stage figure carries a ~20ms dispatch constant; probe19
measured the extprod kernel alone at 2.23 ms/stage-call. This probe
slope-times (lax.scan, two lengths) the FULL vertical_packing (8 rotation
stages at production geometry: T=8, O=24, N=512, B=128 lanes) under the
glue variants:

  pair  — u32-pair stage loop (TFHE_VP_PAIR=1, round-4 default)
  u64   — the u64 XLA stage loop (TFHE_VP_PAIR=0)

Env: PROBE_WHICH, PROBE_S0/S1 (default 2/6), PROBE_B.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    p = PARAMS_SQRD_LVL_64
    b = int(os.environ.get("PROBE_B", "128"))
    t_bits, o_bits = 8, 24
    s0 = int(os.environ.get("PROBE_S0", "2"))
    s1 = int(os.environ.get("PROBE_S1", "6"))
    which = os.environ.get("PROBE_WHICH", "pair,u64").split(",")

    k1 = p.glwe_dimension + 1
    n = p.polynomial_size
    log(f"[p20] backend={jax.default_backend()} B={b} T={t_bits} O={o_bits} "
        f"N={n} scan {s0}/{s1}")

    rng = np.random.default_rng(0)
    # a structurally-valid GGSW operand (values random — cost model only)
    ggsw = jnp.asarray(rng.integers(0, 1 << 64, (b, t_bits, p.cbs_level, k1,
                                                 k1, n), dtype=np.uint64))
    lut = jnp.asarray(rng.integers(0, 1 << 64, (o_bits, 1, n),
                                   dtype=np.uint64))

    def slope(name, body, *ops):
        def run(steps):
            def f(carry, it):
                out = body(it, *ops)
                return carry + out.reshape(-1)[0].astype(jnp.uint32), None

            fn = jax.jit(lambda: jax.lax.scan(
                f, jnp.uint32(0), jnp.arange(steps, dtype=jnp.int32))[0])
            np.asarray(fn())
            best = None
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best

        t_a, t_b2 = run(s0), run(s1)
        ms = (t_b2 - t_a) / (s1 - s0) * 1000
        log(f"[p20] {name}: {ms:.2f} ms/call  (scan {s0}={t_a:.3f}s "
            f"{s1}={t_b2:.3f}s)")
        return ms

    def vp_body(it, g, l):
        g = g + it.astype(jnp.uint64)
        return cbs.vertical_packing(g, l, p, use_conv="pallas"
                                    ).astype(jnp.uint32)

    for name in which:
        os.environ["TFHE_VP_PAIR"] = "1" if name == "pair" else "0"
        slope(f"vp-{name}", vp_body, ggsw, lut)

    return 0


if __name__ == "__main__":
    sys.exit(main())
