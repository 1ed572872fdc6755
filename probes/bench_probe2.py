"""Formulation shootout for the external product on TPU.

  dotref  — bare int8 matmuls of equivalent FLOPs (the MXU ceiling)
  ncgather— int8 NC gather + matmul per step
  conv    — current conv formulation
Env: P2_BATCH (default 128), P2_STEPS (default 32; extrapolate x677/steps).
"""

from __future__ import annotations

import os
import sys
import time


def log(m):
    print(f"[p2 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64 as p

    b = int(os.environ.get("P2_BATCH", "128"))
    steps = int(os.environ.get("P2_STEPS", "32"))
    n, k1, L = p.polynomial_size, p.glwe_dimension + 1, p.pbs_level
    r = k1 * L
    log(f"backend={jax.default_backend()} b={b} steps={steps} R={r} N={n}")

    rng = np.random.default_rng(0)

    def run(name, fn, *args, reps=2):
        f = jax.jit(fn)
        t0 = time.time()
        np.asarray(jax.block_until_ready(f(*args)))
        log(f"{name}: first {time.time()-t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jax.block_until_ready(f(*args)))
            ts.append(time.time() - t0)
        per_step = min(ts) / steps * 1000
        log(f"{name}: steady {min(ts):.3f}s ({per_step:.2f} ms/step-equiv)")

    # --- dotref: 15 int8 matmuls [B, R*N] @ [R*N, k1*N] per step ---
    d8 = jnp.asarray(rng.integers(-127, 128, (b, r * n), dtype=np.int8))
    m8s = jnp.asarray(rng.integers(-127, 128, (steps, r * n, k1 * n), dtype=np.int8))

    def dotref(d8, m8s):
        def step(c, m8):
            acc = None
            for _ in range(15):
                pp = jax.lax.dot(d8, m8, preferred_element_type=jnp.int32)
                acc = pp if acc is None else acc + pp
            return c + acc, None
        init = jnp.zeros((b, k1 * n), jnp.int32)
        return jax.lax.scan(step, init, m8s)[0]

    run("dotref x15", dotref, d8, m8s, reps=1)

    # --- ncgather: build NC from int8 ext planes via take, then matmul ---
    ext8 = jnp.asarray(rng.integers(-127, 128, (steps, 8, r, k1, 2 * n), dtype=np.int8))
    didx = jnp.asarray(((np.arange(n)[None, :] - np.arange(n)[:, None]) % (2 * n))
                       .astype(np.int32))
    d_planes = jnp.asarray(rng.integers(-127, 128, (2, b, r, n), dtype=np.int8))

    def ncgather(d_planes, ext8):
        def step(c, ext_i):
            nc = jnp.take(ext_i, didx, axis=-1)     # [8, r, k1, N, N]
            ncm = jnp.transpose(nc, (0, 1, 3, 2, 4)).reshape(8, r * n, k1 * n)
            acc = None
            for i in range(2):
                dmat = d_planes[i].reshape(b, r * n)
                for j in range(8):
                    if i + j >= 8:
                        continue
                    pp = jax.lax.dot(dmat, ncm[j], preferred_element_type=jnp.int32)
                    acc = pp if acc is None else acc + pp
            return c + acc, None
        init = jnp.zeros((b, k1 * n), jnp.int32)
        return jax.lax.scan(step, init, ext8)[0]

    run("ncgather", ncgather, d_planes, ext8, reps=1)

    # --- conv: current formulation ---
    from tfhe_aes2_tpu.ops import polynomial
    kplanes = jnp.asarray(rng.integers(-127, 128, (steps, 8, k1, r, n), dtype=np.int8))
    digits = jnp.asarray(rng.integers(-2048, 2048, (b, r, n), dtype=np.int32))

    def convf(digits, kplanes):
        def step(c, kp):
            out = polynomial.polymul_digits_conv(digits, kp, 2048)
            return c + out, None
        init = jnp.zeros((b, k1, n), jnp.uint64)
        return jax.lax.scan(step, init, kplanes)[0]

    run("conv", convf, digits, kplanes, reps=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
