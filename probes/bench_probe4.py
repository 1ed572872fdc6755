"""Slope probes: marginal per-step on-chip cost, separating the ~50ms
per-dispatch tunnel overhead from real compute."""

from __future__ import annotations

import sys
import time


def log(m):
    print(f"[p4 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401

    log(f"backend={jax.default_backend()}")
    rng = np.random.default_rng(0)

    def timed(f, *args, reps=3):
        np.asarray(jax.block_until_ready(f(*args)))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jax.block_until_ready(f(*args)))
            ts.append(time.time() - t0)
        return min(ts)

    # --- dot scan slope: repeat the same dot S times in one dispatch ---
    B, K, N = 128, 7680, 2560
    a8 = jnp.asarray(rng.integers(-127, 128, (B, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N), dtype=np.int8))

    def make_dot_loop(s):
        @jax.jit
        def f(a, b):
            def body(i, acc):
                ai = a + i.astype(jnp.int8)  # defeat loop-invariant hoisting
                return acc + jax.lax.dot(
                    ai, b, preferred_element_type=jnp.int32).sum(dtype=jnp.int32)
            return jax.lax.fori_loop(0, s, body, jnp.int32(0))
        return f

    for s in (64, 2048):
        t = timed(make_dot_loop(s), a8, b8)
        log(f"dot loop s={s}: {t*1000:.1f}ms total, marginal window below")
    t8 = timed(make_dot_loop(64), a8, b8)
    t256 = timed(make_dot_loop(2048), a8, b8)
    per = (t256 - t8) / (2048 - 64)
    gmac = B * K * N / 1e9
    log(f"dot marginal {per*1000:.3f} ms/dot -> {2*gmac/per/1e3:.1f} TOP/s eff")

    # --- conv slope ---
    r, o, n = 15, 5, 512
    d8 = jnp.asarray(rng.integers(-127, 128, (B, r, n), dtype=np.int8))
    k8 = jnp.asarray(rng.integers(-127, 128, (o, r, n), dtype=np.int8))
    dn = jax.lax.ConvDimensionNumbers((0, 1, 2), (0, 1, 2), (0, 1, 2))

    def make_conv_loop(s):
        @jax.jit
        def f(d, k):
            def body(i, acc):
                di = d + i.astype(jnp.int8)
                c = jax.lax.conv_general_dilated(
                    di, k, (1,), [(n - 1, n - 1)], dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                return acc + c.sum(dtype=jnp.int32)
            return jax.lax.fori_loop(0, s, body, jnp.int32(0))
        return f

    t8 = timed(make_conv_loop(64), d8, k8)
    t256 = timed(make_conv_loop(2048), d8, k8)
    per = (t256 - t8) / (2048 - 64)
    cg = B * o * (2 * n) * r * n / 1e9
    log(f"conv marginal {per*1000:.3f} ms/conv -> {2*cg/per/1e3:.1f} TOP/s eff "
        f"({cg:.2f} GMAC/conv)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
