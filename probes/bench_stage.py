"""Stage-level dissection of the blind-rotate step at production shapes.

Times, at lvl64 shapes (N=512, k=4, L=3, n=677) and a given batch:
  glue        — monomial rotation + sub + decompose + transpose + limb split
  pallas      — the extprod kernel alone
  full-pallas — the complete scan step (glue + kernel + accumulate + add)
  full-conv   — same step with the conv kernel
  br          — one whole blind_rotate_glwe (677 steps)

Each scanned x16 to get marginal per-step cost. Env: STAGE_BATCH (default
512 = 4 blocks x 128 bits), STAGE_STEPS, STAGE_WHICH (csv).
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
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64
    from tfhe_aes2_tpu.ops import blind_rotate as br_mod
    from tfhe_aes2_tpu.ops import decomposition, polynomial, torus
    from tfhe_aes2_tpu.ops import u32pair as up
    from tfhe_aes2_tpu.ops.pallas import extprod

    p = PARAMS_SQRD_LVL_64
    n = p.polynomial_size
    k1 = p.glwe_dimension + 1
    L = p.pbs_level
    R = k1 * L
    B = int(os.environ.get("STAGE_BATCH", "512"))
    steps = int(os.environ.get("STAGE_STEPS", "16"))
    which = os.environ.get("STAGE_WHICH", "glue,pallas,full-pallas,full-conv,br").split(",")
    bound = decomposition.digit_bound(p.pbs_base_log)
    n_d = torus.limbs_for_bound(bound)

    log(f"[stage] backend={jax.default_backend()} B={B} N={n} k1={k1} L={L} "
        f"R={R} n_lwe={p.lwe_dimension} n_d={n_d} steps={steps}")

    rng = np.random.default_rng(0)
    acc64 = jnp.asarray(rng.integers(0, 1 << 64, (B, k1, n), dtype=np.uint64))
    ts = jnp.asarray(rng.integers(0, 2 * n, (steps, B), dtype=np.int32))
    bsk_pallas = jnp.asarray(
        rng.integers(-127, 128, (steps, 8, R, k1, 2 * n), dtype=np.int8))
    bsk_conv = jnp.asarray(
        rng.integers(-127, 128, (steps, n_d and 8, R, k1, 2 * n), dtype=np.int8))

    def _sync(x):
        # np.asarray forces a device->host readback: the only reliable sync
        # through the axon tunnel (block_until_ready acks at dispatch).
        return jax.tree_util.tree_map(
            lambda a: np.asarray(jax.tree_util.tree_leaves(a)[0])
            if hasattr(a, "dtype") else a, x)

    def timeit(name, f, *args, reps=3):
        try:
            t0 = time.time()
            _sync(f(*args))
            log(f"[stage] {name}: first {time.time()-t0:.1f}s")
            best = None
            for _ in range(reps):
                t0 = time.time()
                _sync(f(*args))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            log(f"[stage] {name}: steady {best*1000:.1f}ms "
                f"({best*1000/steps:.2f}ms/step)")
        except Exception as ex:
            log(f"[stage] {name}: FAIL {type(ex).__name__} {str(ex)[:300]}")

    @jax.jit
    def glue(acc64_in, ts_in):
        acc_pair = up.from_u64(acc64_in)

        def body(c, t_i):
            rot = up.monomial_mul(c, t_i[:, None], n)
            diff = up.sub(rot, c)
            digits = up.decompose(diff, p.pbs_base_log, p.pbs_level)
            digits = jnp.moveaxis(digits, -1, -2).reshape((B, R, n))
            drev = digits
            drev_planes = torus.split_int32_signed(drev, n_d)
            # feed a cheap function of the planes back into the carry so no
            # stage is dead code; the xor is negligible next to the ladder
            upd = drev_planes[0, :, 0, :].astype(jnp.uint32)  # [B, N]
            return (c[0] ^ upd[:, None, :], c[1]), None

        c, _ = jax.lax.scan(body, acc_pair, ts_in)
        return c[0].sum(dtype=jnp.uint32)

    @jax.jit
    def pallas_only(acc64_in, bsk_in):
        acc_pair = up.from_u64(acc64_in)
        digits = up.decompose(acc_pair, p.pbs_base_log, p.pbs_level)
        digits = jnp.moveaxis(digits, -1, -2).reshape((B, R, n))
        drev = digits
        drev_planes = torus.split_int32_signed(drev, n_d)
        def body(c, planes_i):
            parts = extprod.extprod_partials(drev_planes, planes_i)
            return c + parts.sum(dtype=jnp.int32), None
        c, _ = jax.lax.scan(body, jnp.int32(0), bsk_in)
        return c

    def partial_step_fn(upto):
        """upto: 'extprod' | 'accum' | 'noadd' — stop the step early to
        bisect where the time goes."""
        def step(acc_pair, xs):
            planes_i, t_i = xs
            rot = up.monomial_mul(acc_pair, t_i[:, None], n)
            diff = up.sub(rot, acc_pair)
            digits = up.decompose(diff, p.pbs_base_log, p.pbs_level)
            digits = jnp.moveaxis(digits, -1, -2).reshape((B, R, n))
            drev = digits
            drev_planes = torus.split_int32_signed(drev, n_d)
            parts = extprod.extprod_partials(drev_planes, planes_i)
            if upto == "extprod":
                fold = parts[0, :, 0, :n].astype(jnp.uint32)
                return (acc_pair[0] ^ fold[:, None, :], acc_pair[1]), None
            partials = {s: parts[s] for s in range(8)}
            out_pair = up.accumulate_partials(partials)
            if upto == "accum":
                return (acc_pair[0] ^ out_pair[0], acc_pair[1] ^ out_pair[1]), None
            return up.add(acc_pair, out_pair), None

        @jax.jit
        def run(acc64_in, bsk_in, ts_in):
            acc_pair = up.from_u64(acc64_in)
            c, _ = jax.lax.scan(step, acc_pair, (bsk_in, ts_in))
            return up.to_u64(*c)
        return run

    @jax.jit
    def glue_trans(acc64_in, ts_in):
        """glue + the exact kernel-input transposes, but no pallas call."""
        acc_pair = up.from_u64(acc64_in)

        def body(c, t_i):
            rot = up.monomial_mul(c, t_i[:, None], n)
            diff = up.sub(rot, c)
            digits = up.decompose(diff, p.pbs_base_log, p.pbs_level)
            digits = jnp.moveaxis(digits, -1, -2).reshape((B, R, n))
            drev = digits
            drev_planes = torus.split_int32_signed(drev, n_d)
            drev_r_first = jnp.moveaxis(drev_planes, 2, 0)     # [R,n_d,B,N]
            fold = drev_r_first[0, 0].astype(jnp.uint32)       # [B, N]
            return (c[0] ^ fold[:, None, :], c[1]), None

        c, _ = jax.lax.scan(body, acc_pair, ts_in)
        return c[0].sum(dtype=jnp.uint32)

    if "glue-trans" in which:
        timeit("glue-trans x%d" % steps, glue_trans, acc64, ts)

    def cheap_step_fn():
        """Digits derived from the carry with ~2 cheap ops (not hoistable),
        then the pallas kernel: isolates glue<->kernel interaction cost."""
        def step(acc_pair, xs):
            planes_i, t_i = xs
            base = acc_pair[0][:, :1, :]                       # [B, 1, N]
            drev_planes = jnp.broadcast_to(
                (base + t_i[:, None, None].astype(jnp.uint32))
                .astype(jnp.int8)[None], (n_d, B, R, n))
            parts = extprod.extprod_partials(drev_planes, planes_i)
            partials = {s: parts[s] for s in range(8)}
            out_pair = up.accumulate_partials(partials)
            return up.add(acc_pair, out_pair), None

        @jax.jit
        def run(acc64_in, bsk_in, ts_in):
            acc_pair = up.from_u64(acc64_in)
            c, _ = jax.lax.scan(step, acc_pair, (bsk_in, ts_in))
            return up.to_u64(*c)
        return run

    if "cheap-digits" in which:
        timeit("cheap-digits x%d" % steps, cheap_step_fn(), acc64, bsk_pallas, ts)

    if "upto-extprod" in which:
        timeit("upto-extprod x%d" % steps, partial_step_fn("extprod"),
               acc64, bsk_pallas, ts)
    if "upto-accum" in which:
        timeit("upto-accum x%d" % steps, partial_step_fn("accum"),
               acc64, bsk_pallas, ts)

    def full_step_fn(mode):
        def step(acc_pair, xs):
            planes_i, t_i = xs
            rot = up.monomial_mul(acc_pair, t_i[:, None], n)
            diff = up.sub(rot, acc_pair)
            digits = up.decompose(diff, p.pbs_base_log, p.pbs_level)
            digits = jnp.moveaxis(digits, -1, -2).reshape((B, R, n))
            if mode == "pallas":
                drev = digits
                drev_planes = torus.split_int32_signed(drev, n_d)
                parts = extprod.extprod_partials(drev_planes, planes_i)
                partials = {s: parts[s] for s in range(8)}
            else:
                partials = polynomial.conv_partials(digits, planes_i, bound)
            out_pair = up.accumulate_partials(partials)
            return up.add(acc_pair, out_pair), None

        @jax.jit
        def run(acc64_in, bsk_in, ts_in):
            acc_pair = up.from_u64(acc64_in)
            c, _ = jax.lax.scan(step, acc_pair, (bsk_in, ts_in))
            return up.to_u64(*c)
        return run

    if "glue" in which:
        timeit("glue x%d" % steps, glue, acc64, ts)
    if "pallas" in which:
        timeit("pallas x%d" % steps, pallas_only, acc64, bsk_pallas)
    if "full-pallas" in which:
        timeit("full-pallas x%d" % steps, full_step_fn("pallas"), acc64, bsk_pallas, ts)
    if "full-conv" in which:
        from tfhe_aes2_tpu.ops.polynomial import split_polys_for_conv
        bsk_rows64 = jnp.asarray(
            rng.integers(0, 1 << 64, (steps, R, k1, n), dtype=np.uint64))
        planes_conv = jax.vmap(split_polys_for_conv)(bsk_rows64)
        timeit("full-conv x%d" % steps, full_step_fn("conv"), acc64, planes_conv, ts)
    if "br" in which:
        lwe = jnp.asarray(
            rng.integers(0, 1 << 64, (B, p.lwe_dimension + 1), dtype=np.uint64))
        bsk = jnp.asarray(rng.integers(
            0, 1 << 64, (p.lwe_dimension, L, k1, k1, n), dtype=np.uint64))
        test_poly = jnp.asarray(rng.integers(0, 1 << 64, (n,), dtype=np.uint64))
        fn = jax.jit(lambda l, b, t: br_mod.blind_rotate(l, b, t, p))
        timeit("blind_rotate full", fn, lwe, bsk, test_poly, reps=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
