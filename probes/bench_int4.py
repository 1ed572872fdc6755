"""Probe 17: int4 MXU throughput vs int8 on v5e (Mosaic).

If int4 x int4 -> int32 dots run at ~2x the int8 rate, the CMux step's limb
decomposition can move to 4-bit planes: digits 2^11 need 3 int4 limbs (vs 2
int8), BSK planes 12 int4 (vs 6 int8 at js=2), kept pair count ~27 vs 11 —
work ratio (27·16)/(11·64) = 0.61 of the int8 multiply-bits at 2x rate
=> ~1.6x potential step speedup. This probe measures raw chained dots.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl

    import tfhe_aes2_tpu  # noqa: F401

    m = k = n = 1024
    chain = 64

    def kern(dtype, x_ref, y_ref, o_ref):
        acc = jnp.zeros((m, n), jnp.int32)
        x = x_ref[...]
        for i in range(chain):
            acc = acc + jnp.dot(x, y_ref[...],
                                preferred_element_type=jnp.int32)
            # rotate x so the chain cannot be collapsed
            x = jnp.concatenate([x[1:], x[:1]], axis=0)
        o_ref[...] = acc

    rng = np.random.default_rng(0)
    for name, dt, lo, hi in (("int8", jnp.int8, -128, 127),
                             ("int4", jnp.int4, -8, 7)):
        try:
            x = jnp.asarray(rng.integers(lo, hi, (m, k)), jnp.int8)
            y = jnp.asarray(rng.integers(lo, hi, (k, n)), jnp.int8)
            with jax.enable_x64(False):
                f = pl.pallas_call(
                    functools.partial(kern, dt),
                    out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
                    input_output_aliases={},
                )
                g = jax.jit(lambda a, b: f(a.astype(dt), b.astype(dt)))
                out = g(x, y)
                out.block_until_ready()
                reps = 5
                t0 = time.time()
                for _ in range(reps):
                    out = g(x, y)
                out.block_until_ready()
                dt_s = (time.time() - t0) / reps
            macs = m * k * n * chain
            print(f"[int4probe] {name}: {dt_s*1e3:.2f} ms/call "
                  f"-> {macs/dt_s/1e12:.1f} TOPS")
        except Exception as e:
            print(f"[int4probe] {name}: FAILED {type(e).__name__}: {e}"[:500])
    return 0


if __name__ == "__main__":
    sys.exit(main())
