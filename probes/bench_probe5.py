"""Bisect which kernel construct breaks Mosaic legalization."""

from __future__ import annotations

import functools
import sys
import time


def log(m):
    print(f"[p5 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    B, R, N = 128, 15, 512

    d = jnp.asarray(rng.integers(-127, 128, (B, R, N), dtype=np.int8))
    e = jnp.asarray(rng.integers(-127, 128, (R, 2 * N), dtype=np.int8))

    def ladder(ext_row, n):
        m = pltpu.roll(ext_row.astype(jnp.int32), jnp.int32(n), 1)
        size = 1
        while size < n:
            m = jnp.concatenate(
                [m, pltpu.roll(m, jnp.int32(2 * n - size), 1)], axis=0)
            size *= 2
        return m

    def make(variant):
        def kernel(d_ref, e_ref, o_ref, acc):
            acc[...] = jnp.zeros_like(acc)
            r_iters = 2 if variant.get("small") else R
            for r in range(r_iters):
                ext = e_ref[r][None, :]
                if variant.get("ladder"):
                    rot = ladder(ext, N)
                    ncm = rot[:, :N].astype(jnp.int8) if variant.get("cast") \
                        else rot[:, :N]
                else:
                    ncm = jnp.broadcast_to(ext[:, :N], (N, N))
                a = d_ref[:, r, :]
                if ncm.dtype != jnp.int8:
                    contrib = jnp.dot(a.astype(jnp.int32), ncm,
                                      preferred_element_type=jnp.int32)
                else:
                    contrib = jnp.dot(a, ncm, preferred_element_type=jnp.int32)
                if variant.get("rank1"):
                    contrib += jnp.dot(a[:, :1], ext[:, :N],
                                       preferred_element_type=jnp.int32)
                acc[...] += contrib
            o_ref[...] = acc[...]

        @jax.jit
        def f(d, e):
            return pl.pallas_call(
                kernel,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, N), jnp.int32),
                scratch_shapes=[pltpu.VMEM((B, N), jnp.int32)],
            )(d, e)
        return f

    variants = [
        ("plain dot only", {"small": True}),
        ("ladder no cast (int32 dot)", {"small": True, "ladder": True}),
        ("ladder + cast int8", {"small": True, "ladder": True, "cast": True}),
        ("ladder + cast + rank1", {"small": True, "ladder": True, "cast": True,
                                   "rank1": True}),
        ("full R ladder cast", {"ladder": True, "cast": True}),
    ]
    for name, v in variants:
        try:
            f = make(v)
            t0 = time.time()
            np.asarray(jax.block_until_ready(f(d, e)))
            log(f"{name}: OK first {time.time()-t0:.1f}s")
            ts = []
            for _ in range(2):
                t0 = time.time()
                np.asarray(jax.block_until_ready(f(d, e)))
                ts.append(time.time() - t0)
            log(f"{name}: steady {min(ts)*1000:.1f}ms")
        except Exception as ex:
            log(f"{name}: FAIL {type(ex).__name__} {str(ex)[:160]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
