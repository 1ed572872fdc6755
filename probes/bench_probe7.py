"""Isolate why the long-K CMux kernel underperforms the (o, r)-grid kernel.

Variants, each scanned STEPS times at production shapes (B=512, N=512, R=15,
O=5, j_cnt=7):
  step2       — the (bt, o, r) grid kernel (baseline, in-scan)
  longk       — the (bt, o, j) long-K kernel as written
  longk-nodot — longk with the dots removed (NC builds + fini only)
  longk-nonc  — longk with the NC builds removed (dots read stale scratch)
  longk-dyn   — dynamic-index bucket writes instead of 7 pl.when branches

Env: P7_WHICH (csv), P7_BATCH, P7_STEPS.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[p7 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.pallas import extprod

    B = int(os.environ.get("P7_BATCH", "512"))
    steps = int(os.environ.get("P7_STEPS", "32"))
    which = os.environ.get(
        "P7_WHICH", "step2,longk,longk-nodot,longk-nonc").split(",")
    n_d, R, O, N, j_start = 2, 15, 5, 512, 1
    j_cnt = 8 - j_start

    rng = np.random.default_rng(0)
    dig_rf = jnp.asarray(
        rng.integers(-127, 128, (R, n_d, B, N), dtype=np.int8))
    dig_flat = jnp.asarray(
        rng.integers(-127, 128, (n_d, B, R * N), dtype=np.int8))
    ext_or = jnp.asarray(
        rng.integers(-127, 128, (O, R, j_cnt, 2 * N), dtype=np.int8))
    ext_oj = jnp.asarray(
        rng.integers(-127, 128, (O, j_cnt, R, 2 * N), dtype=np.int8))
    acc0 = jnp.asarray(
        rng.integers(0, 1 << 32, (O, 2, B, N), dtype=np.uint32))

    def scan_of(step_fn, xs):
        @jax.jit
        def run(acc):
            def body(acc, _):
                return step_fn(acc), None
            out, _ = jax.lax.scan(body, acc, None, length=steps)
            return out
        return run

    def timeit(name, fn, *args, reps=3):
        t0 = time.time()
        np.asarray(jax.block_until_ready(fn(*args)))
        log(f"{name}: first {time.time()-t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.time()
            np.asarray(jax.block_until_ready(fn(*args)))
            ts.append(time.time() - t0)
        best = min(ts)
        log(f"{name}: steady {best*1000:.1f}ms ({best/steps*1000:.2f}ms/step)")

    # ---- variant kernels (copies of _kernel_longk with pieces removed) ----
    def _nc_rows(ext_row, n):
        return extprod._nc_rows(ext_row, n)

    def make_longk_variant(do_dots: bool, do_nc: bool, dyn: bool):
        def kern(dig_ref, ext_ref, acc_ref, out_ref, nc_ref, part_ref):
            jj = pl.program_id(2)
            if do_nc:
                for r in range(R):
                    nc_ref[r * N: (r + 1) * N, :] = _nc_rows(
                        ext_ref[0, 0, r: r + 1, :], N)[:, :N]
            if do_dots and not dyn:
                for j_val in range(j_start, 8):
                    @pl.when(jj == j_val - j_start)
                    def _dots(j_val=j_val):
                        for i in range(n_d):
                            s = j_val + i
                            if s >= 8:
                                continue
                            c = jnp.dot(dig_ref[i], nc_ref[...],
                                        preferred_element_type=jnp.int32)
                            if j_val == max(j_start, s - n_d + 1):
                                part_ref[s] = c
                            else:
                                part_ref[s] = part_ref[s] + c
            if do_dots and dyn:
                @pl.when(jj == 0)
                def _init():
                    part_ref[...] = jnp.zeros_like(part_ref)
                j = jj + j_start
                c0 = jnp.dot(dig_ref[0], nc_ref[...],
                             preferred_element_type=jnp.int32)
                part_ref[pl.ds(j, 1)] = part_ref[pl.ds(j, 1)] + c0[None]
                c1 = jnp.dot(dig_ref[1], nc_ref[...],
                             preferred_element_type=jnp.int32)
                @pl.when(jj < j_cnt - 1)
                def _w1():
                    part_ref[pl.ds(j + 1, 1)] = (part_ref[pl.ds(j + 1, 1)]
                                                 + c1[None])

            @pl.when(jj == j_cnt - 1)
            def _fini():
                lo = acc_ref[0, 0]
                hi = acc_ref[0, 1]
                for s in range(j_start, 8):
                    val = part_ref[s]
                    v_lo = val.astype(jnp.uint32)
                    v_hi = (val >> 31).astype(jnp.uint32)
                    sh = 8 * s
                    if sh < 32:
                        c_lo = v_lo << jnp.uint32(sh)
                        c_hi = ((v_hi << jnp.uint32(sh))
                                | (v_lo >> jnp.uint32(32 - sh)))
                    else:
                        c_lo = jnp.zeros_like(v_lo)
                        c_hi = v_lo << jnp.uint32(sh - 32)
                    s_lo = lo + c_lo
                    carry = (s_lo < lo).astype(jnp.uint32)
                    lo, hi = s_lo, hi + c_hi + carry
                out_ref[0, 0] = lo
                out_ref[0, 1] = hi

        @jax.jit
        def step(acc):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    grid=(1, O, j_cnt),
                    in_specs=[
                        pl.BlockSpec((n_d, B, R * N),
                                     lambda bb, oo, jj: (0, bb, 0)),
                        pl.BlockSpec((1, 1, R, 2 * N),
                                     lambda bb, oo, jj: (oo, jj, 0, 0)),
                        pl.BlockSpec((1, 2, B, N),
                                     lambda bb, oo, jj: (oo, 0, bb, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 2, B, N),
                                           lambda bb, oo, jj: (oo, 0, bb, 0)),
                    out_shape=jax.ShapeDtypeStruct((O, 2, B, N), jnp.uint32),
                    scratch_shapes=[pltpu.VMEM((R * N, N), jnp.int8),
                                    pltpu.VMEM((8, B, N), jnp.int32)],
                    input_output_aliases={2: 0},
                )(dig_flat, ext_oj, acc)
        return step

    if "step2" in which:
        step2 = lambda acc: extprod.extprod_step2(
            dig_rf, ext_or, acc, j_start=j_start, max_tile=B)
        timeit("step2", scan_of(step2, None), acc0)
    if "longk" in which:
        timeit("longk", scan_of(
            make_longk_variant(True, True, False), None), acc0)
    if "longk-nodot" in which:
        timeit("longk-nodot", scan_of(
            make_longk_variant(False, True, False), None), acc0)
    if "longk-nonc" in which:
        timeit("longk-nonc", scan_of(
            make_longk_variant(True, False, False), None), acc0)
    if "longk-dyn" in which:
        timeit("longk-dyn", scan_of(
            make_longk_variant(True, True, True), None), acc0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
