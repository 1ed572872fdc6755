"""Locate the MXU ceiling: big int8/bf16 dots + a tiled Pallas int8 matmul."""

from __future__ import annotations

import functools
import os
import sys
import time


def log(m):
    print(f"[p3 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    M, K, N = 4096, 7680, 2560
    flops = 2 * M * K * N

    def run(name, fn, *args, reps=3):
        # reduce on-device so the tunnel transfer (~40 MB/s) stays out of
        # the measurement
        f = jax.jit(lambda *a: fn(*a).ravel()[::65537].astype(jnp.float32).sum())
        t0 = time.time()
        np.asarray(jax.block_until_ready(f(*args)))
        log(f"{name}: first {time.time()-t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jax.block_until_ready(f(*args)))
            ts.append(time.time() - t0)
        log(f"{name}: steady {min(ts)*1000:.1f}ms -> {flops/min(ts)/1e12:.1f} TOP/s")

    a8 = jnp.asarray(rng.integers(-127, 128, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))
    run("bigdot int8->int32", lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.int32), a8, b8)

    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)
    run("bigdot bf16->f32", lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.float32), abf, bbf)

    # Pallas tiled int8 matmul
    TM, TN = 256, 512

    def mm_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.int32)

    @jax.jit
    def pallas_mm(a, b):
        return pl.pallas_call(
            mm_kernel,
            grid=(M // TM, N // TN),
            in_specs=[
                pl.BlockSpec((TM, K), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, TN), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32),
        )(a, b)

    try:
        run("pallas int8 mm", pallas_mm, a8, b8)
    except Exception as e:
        log(f"pallas int8 mm failed: {type(e).__name__}: {str(e)[:300]}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
