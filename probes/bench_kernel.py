"""Microbench of the blind-rotate pallas kernel internals at lvl64 shapes.

Variants, each x STEPS scan steps (checksum output, so readback cost is
constant and tiny):

  full      -- the production fused kernel (extprod_step2) per step
  dots      -- same grid/dots, ncm built ONCE per cell reused for all j
               (isolates ncm-build cost: full - dots ~= ladder cost)
  nobuild   -- dots against a ncm slice from a preloaded HBM input
               (no in-kernel build at all)
  noaccum   -- dots only, single running value (no per-bucket scratch rw)
  glue      -- rot_diff_digits alone per step

Env: KB_BATCH (default 512), KB_STEPS (default 16), KB_WHICH (csv).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64
    from tfhe_aes2_tpu.ops.pallas import extprod

    p = PARAMS_SQRD_LVL_64
    n = p.polynomial_size
    k1 = p.glwe_dimension + 1
    r_cnt = k1 * p.pbs_level
    n_d, js = 2, 1
    b = int(os.environ.get("KB_BATCH", "512"))
    steps = int(os.environ.get("KB_STEPS", "16"))
    which = os.environ.get("KB_WHICH", "full,dots,noaccum,glue").split(",")

    log(f"[kb] backend={jax.default_backend()} B={b} N={n} k1={k1} R={r_cnt} "
        f"steps={steps}")

    rng = np.random.default_rng(0)
    dig = jnp.asarray(rng.integers(-127, 128, (steps, r_cnt, n_d, b, n),
                                   dtype=np.int8))
    ext = jnp.asarray(rng.integers(-127, 128, (steps, k1, r_cnt, 8 - js, 2 * n),
                                   dtype=np.int8))
    acc0 = jnp.asarray(rng.integers(0, 1 << 32, (k1, 2, b, n), dtype=np.uint32))
    ts = jnp.asarray(rng.integers(0, 2 * n, (steps, b), dtype=np.int32))

    def timeit(name, f, *args, reps=3):
        try:
            t0 = time.time()
            np.asarray(f(*args))
            first = time.time() - t0
            best = None
            for _ in range(reps):
                t0 = time.time()
                np.asarray(f(*args))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            log(f"[kb] {name:9s} first {first:6.1f}s steady {best*1000:8.2f}ms"
                f" ({best*1000/steps:.3f}ms/step)")
        except Exception as ex:
            log(f"[kb] {name:9s} FAIL {type(ex).__name__} {str(ex)[:300]}")

    # ---- full production step ----
    def make_full(step_fn):
        @jax.jit
        def run_full(acc, dig_in, ext_in):
            def step(a, xs):
                d, e = xs
                return step_fn(d, e, a, j_start=js), None
            a, _ = jax.lax.scan(step, acc, (dig_in, ext_in))
            return a.astype(jnp.uint32).sum()
        return run_full

    # ---- variant kernels ----
    def kern_dots(mode, dig_ref, ext_ref, acc_ref, out_ref, part_ref):
        """mode 'dots': one ncm per cell (not per j) — dots+accum at full
        volume, 1/7 of the builds. mode 'noaccum': also accumulate into one
        bucket only (no per-s scratch read-modify-write)."""
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            part_ref[...] = jnp.zeros_like(part_ref)

        ncm = extprod._nc_rows(ext_ref[0, 0, 0:1, :], n)[:, :n]
        for j in range(js, 8):
            for i in range(n_d):
                s = i + j
                if s >= 8:
                    continue
                contrib = jnp.dot(dig_ref[0, i], ncm,
                                  preferred_element_type=jnp.int32)
                if mode == "dots":
                    part_ref[s] = part_ref[s] + contrib
                else:
                    part_ref[0] = part_ref[0] + contrib

        @pl.when(r == r_cnt - 1)
        def _fini():
            out_ref[0, 0] = acc_ref[0, 0] + part_ref[0].astype(jnp.uint32)
            out_ref[0, 1] = acc_ref[0, 1] + part_ref[1].astype(jnp.uint32)

    def make_variant(mode):
        kern = functools.partial(kern_dots, mode)

        def one(dig_in, ext_in, acc):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    grid=(1, k1, r_cnt),
                    in_specs=[
                        pl.BlockSpec((1, n_d, b, n),
                                     lambda bb, oo, rr: (rr, 0, bb, 0)),
                        pl.BlockSpec((1, 1, 8 - js, 2 * n),
                                     lambda bb, oo, rr: (oo, rr, 0, 0)),
                        pl.BlockSpec((1, 2, b, n),
                                     lambda bb, oo, rr: (oo, 0, bb, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 2, b, n),
                                           lambda bb, oo, rr: (oo, 0, bb, 0)),
                    out_shape=jax.ShapeDtypeStruct((k1, 2, b, n), jnp.uint32),
                    scratch_shapes=[pltpu.VMEM((8, b, n), jnp.int32)],
                    input_output_aliases={2: 0},
                )(dig_in, ext_in, acc)

        @jax.jit
        def run(acc, dig_in, ext_in):
            def step(a, xs):
                d, e = xs
                return one(d, e, a), None
            a, _ = jax.lax.scan(step, acc, (dig_in, ext_in))
            return a.astype(jnp.uint32).sum()
        return run

    # ---- glue alone ----
    @jax.jit
    def run_glue(acc, ts_in):
        def step(a, t_i):
            d = extprod.rot_diff_digits(a, t_i, p.pbs_base_log, p.pbs_level,
                                        n_d)
            upd = d[0, 0].astype(jnp.uint32)[None, None]    # [1,1,B,N]
            return a ^ jnp.pad(upd, ((0, k1 - 1), (0, 1), (0, 0), (0, 0))), None
        a, _ = jax.lax.scan(step, acc, ts_in)
        return a.astype(jnp.uint32).sum()

    if "full" in which:
        timeit("full", make_full(extprod.extprod_step2), acc0, dig, ext)
    if "bucket" in which:
        timeit("bucket", make_full(extprod.extprod_step3), acc0, dig, ext)
    if "merged" in which:
        @jax.jit
        def run_merged(acc, ts_in, ext_in):
            def step(a, xs):
                t_i, e = xs
                return extprod.cmux_step_merged(
                    t_i, e, a, p.pbs_base_log, p.pbs_level, j_start=js), None
            a, _ = jax.lax.scan(step, acc, (ts_in, ext_in))
            return a.astype(jnp.uint32).sum()
        timeit("merged", run_merged, acc0, ts, ext)
    if "dots" in which:
        timeit("dots", make_variant("dots"), acc0, dig, ext)
    if "noaccum" in which:
        timeit("noaccum", make_variant("noaccum"), acc0, dig, ext)
    if "glue" in which:
        timeit("glue", run_glue, acc0, ts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
