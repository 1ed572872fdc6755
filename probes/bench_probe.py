"""Isolation probes for the blind-rotate hot loop on TPU.

Times, for the production parameter set:
  A. glue-only scan (monomial rotation + decomposition + cheap accumulate)
  B. conv-only scan (external product convs with fixed digits)
  C. full blind rotate at several batch sizes

Env: PROBE_BATCHES (comma list, default "128,512").
"""

from __future__ import annotations

import os
import sys
import time


def log(m):
    print(f"[probe {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops import blind_rotate as br
    from tfhe_aes2_tpu.ops import decomposition, keys as keys_mod, polynomial
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64 as p

    batches = [int(x) for x in os.environ.get("PROBE_BATCHES", "128,512").split(",")]
    log(f"backend={jax.default_backend()}")
    client, sks = keys_mod.generate_keys(p, seed=5)
    log("keygen done")
    bsk = jnp.asarray(sks.bsk)
    n, L, k1, _, N = bsk.shape

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
        log(f"{name}: steady {min(ts):.3f}s")

    for b in batches:
        acc0 = jnp.asarray(rng.integers(0, 1 << 64, (b, k1, N), dtype=np.uint64))
        a_t = jnp.asarray(rng.integers(0, 2 * N, (n, b), dtype=np.int32))

        # A: glue only — rotation + decomposition, cheap combine
        def glue(acc, a_steps):
            def step(acc, a_i):
                rot = polynomial.monomial_mul(acc, a_i[..., None])
                d = br.decompose_glwe(rot - acc, p.pbs_base_log, p.pbs_level)
                # cheap combine keeping shapes: fold digits back into acc
                folded = jnp.asarray(
                    d.reshape(d.shape[:-2] + (k1, L, N)).sum(axis=-2),
                    jnp.int64).astype(jnp.uint64)
                return acc + folded, None
            return jax.lax.scan(step, acc, a_steps)[0]

        run(f"glue b={b}", glue, acc0, a_t)

        # B: conv only — fixed digits, scan over bsk planes
        bsk_rows = jax.vmap(br._bsk_rows)(bsk)
        planes_all = jax.vmap(polynomial.split_polys_for_conv)(bsk_rows)
        digits = jnp.asarray(rng.integers(-2048, 2048, (b, L * k1, N), dtype=np.int32))

        def convonly(digits, planes_all):
            def step(carry, planes_i):
                out = polynomial.polymul_digits_conv(
                    digits, planes_i, decomposition.digit_bound(p.pbs_base_log))
                return carry + out, None
            init = jnp.zeros((b, k1, N), dtype=jnp.uint64)
            return jax.lax.scan(step, init, planes_all)[0]

        run(f"convonly b={b}", convonly, digits, planes_all, reps=1)

        # C: full blind rotate
        lwe = jnp.asarray(rng.integers(0, 1 << 64, (b, p.lwe_dimension + 1),
                                       dtype=np.uint64))
        tv = jnp.full((N,), jnp.uint64(1 << 60))

        def full(lwe):
            return br.blind_rotate(lwe, bsk, tv, p)

        run(f"full blind rotate b={b}", full, lwe, reps=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
