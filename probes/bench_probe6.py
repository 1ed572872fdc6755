"""Test the real extprod kernel standalone, then inside a scan."""

from __future__ import annotations

import sys
import time


def log(m):
    print(f"[p6 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.pallas import extprod

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)
    n_d, B, R, O, N = 2, 128, 15, 5, 512
    steps = 16

    d_planes = jnp.asarray(rng.integers(-127, 128, (n_d, B, R, N), dtype=np.int8))
    ext = jnp.asarray(rng.integers(-127, 128, (8, R, O, 2 * N), dtype=np.int8))
    ext_steps = jnp.asarray(
        rng.integers(-127, 128, (steps, 8, R, O, 2 * N), dtype=np.int8))

    def run(name, f, *args, reps=2):
        try:
            t0 = time.time()
            np.asarray(jax.block_until_ready(f(*args)))
            log(f"{name}: OK first {time.time()-t0:.1f}s")
            ts = []
            for _ in range(reps):
                t0 = time.time()
                np.asarray(jax.block_until_ready(f(*args)))
                ts.append(time.time() - t0)
            log(f"{name}: steady {min(ts)*1000:.1f}ms")
        except Exception as ex:
            log(f"{name}: FAIL {type(ex).__name__} {str(ex)[:200]}")

    @jax.jit
    def single(dp, e):
        return extprod.extprod_partials(dp, e).sum(dtype=jnp.int32)

    run("extprod single", single, d_planes, ext)

    @jax.jit
    def scanned(dp, es):
        def step(c, e_i):
            p = extprod.extprod_partials(dp, e_i)
            return c + p.sum(dtype=jnp.int32), None
        return jax.lax.scan(step, jnp.int32(0), es)[0]

    run(f"extprod scan x{steps}", scanned, d_planes, ext_steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
