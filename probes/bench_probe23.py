"""probe23 — attribute the ~59ms/round of in-program glue probe21 left over.

probe21's budget at 8 blocks: round 1081.7ms vs pbs ~990 + vp 25.2 + pfks
6.7 + ks ~1 = ~1023. Suspects, slope-timed here at production shapes:

  init-rot   — the gather-based initial X^{-b~} rotation of the blind-rotate
               accumulator (polynomial.monomial_mul: take_along_axis on
               [1024, 5, 1024] u64 — TPU gathers are scalar-bound; the scan
               steps use ladder rotations but the entry rotation was never
               converted)
  init-rot-pair — the same rotation as the u32-pair ladder (up.monomial_mul)
  prescan    — full blind-rotate entry glue: mod_switch + broadcast +
               initial rotation + pair conversion + first digit build
  extract    — sample_extract0 on the pbs output shapes
  xorlayer   — a MixColumns-depth XOR chain on full states
  split      — ggsw_to_rows + split_polys_for_pallas for one VP operand set

Env: PROBE_B blocks (default 8), PROBE_S0/S1 (default 4/12), PROBE_WHICH.
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
    from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs_ops
    from tfhe_aes2_tpu.ops import polynomial
    from tfhe_aes2_tpu.ops import u32pair as up
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    p = PARAMS_SQRD_LVL_64
    blocks = int(os.environ.get("PROBE_B", "8"))
    s0 = int(os.environ.get("PROBE_S0", "4"))
    s1 = int(os.environ.get("PROBE_S1", "12"))
    which = os.environ.get(
        "PROBE_WHICH", "init-rot,init-rot-pair,prescan,extract,xorlayer,split"
    ).split(",")

    n = p.polynomial_size
    k1 = p.glwe_dimension + 1
    lanes = blocks * 128
    log(f"[p23] backend={jax.default_backend()} blocks={blocks} lanes={lanes} "
        f"scan {s0}/{s1}")

    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.integers(0, 1 << 64, (lanes, k1, n),
                                   dtype=np.uint64))
    bt = jnp.asarray(rng.integers(0, 2 * n, (lanes,), dtype=np.int32))

    def slope(name, body, *ops):
        def run(steps):
            def f(ops, carry, it):
                out = body(it, *ops)
                return carry + jnp.sum(out.astype(jnp.uint32),
                                       dtype=jnp.uint32), None

            def outer(*ops):
                import functools
                return jax.lax.scan(
                    functools.partial(f, ops), jnp.uint32(0),
                    jnp.arange(steps, dtype=jnp.int32))[0]

            fn = jax.jit(outer)
            np.asarray(fn(*ops))
            best = None
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(*ops))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best

        t_a, t_b = run(s0), run(s1)
        ms = (t_b - t_a) / (s1 - s0) * 1000
        log(f"[p23] {name}: {ms:.2f} ms/call  (scan {s0}={t_a:.3f}s "
            f"{s1}={t_b:.3f}s)")
        return ms

    if "init-rot" in which:
        slope("init-rot (gather)", lambda it, a, t: polynomial.monomial_mul(
            a + it.astype(jnp.uint64), ((2 * n - t) % (2 * n))[..., None]
        ).astype(jnp.uint32), acc, bt)

    if "init-rot-pair" in which:
        def rot_pair(it, a, t):
            pair = up.from_u64(a + it.astype(jnp.uint64))
            lo, hi = up.monomial_mul(pair, ((2 * n - t) % (2 * n))[..., None],
                                     n)
            return lo + hi
        slope("init-rot (pair ladder)", rot_pair, acc, bt)

    if "extract" in which:
        from tfhe_aes2_tpu.ops import blind_rotate as br
        slope("sample_extract0", lambda it, a: br.sample_extract0(
            a + it.astype(jnp.uint64)).astype(jnp.uint32), acc)

    if "xorlayer" in which:
        n1 = p.big_lwe_dimension + 1
        st = [jnp.asarray(rng.integers(0, 1 << 64, (blocks, 16, 8, n1),
                                       dtype=np.uint64)) for _ in range(3)]

        def xors(it, a, b, c):
            a = a + it.astype(jnp.uint64)
            # MixColumns-ish combine: ~5 full-state adds
            x = a + b
            y = b + c
            z = x + y
            w = z + a
            return (w + c).astype(jnp.uint32)
        slope("xorlayer (5 state adds)", xors, *st)

    if "split" in which:
        from tfhe_aes2_tpu.ops.pallas import extprod
        ggsw = jnp.asarray(rng.integers(0, 1 << 64,
                                        (128, 8, p.cbs_level, k1, k1, n),
                                        dtype=np.uint64))

        def split(it, g):
            rows = cbs_ops.ggsw_to_rows(
                (g + it.astype(jnp.uint64)).reshape((-1,) + g.shape[-4:]))
            planes = jax.vmap(extprod.split_polys_for_pallas)(rows)
            return planes.astype(jnp.int32).sum(axis=0).astype(jnp.uint32)
        slope("ggsw split_polys", split, ggsw)

    if "prescan" in which:
        from tfhe_aes2_tpu.ops import blind_rotate as br
        from tfhe_aes2_tpu.ops import decomposition, torus
        lwe = jnp.asarray(rng.integers(0, 1 << 64,
                                       (lanes, p.lwe_dimension + 1),
                                       dtype=np.uint64))

        def prescan(it, lw, a):
            lw = lw + it.astype(jnp.uint64)
            a_t = br.mod_switch(lw[..., :-1], p.log2_poly_size)
            b_t = br.mod_switch(lw[..., -1], p.log2_poly_size)
            accr = polynomial.monomial_mul(
                a, ((2 * n - b_t) % (2 * n))[..., None])
            pair = up.from_u64(accr)
            return (pair[0] + pair[1] + a_t.sum(axis=-1, dtype=jnp.int32
                                                )[:, None, None].astype(
                                                    jnp.uint32))
        slope("prescan glue", prescan, lwe, acc)

    return 0


if __name__ == "__main__":
    sys.exit(main())
