"""In-scan CMux step shootout at production shapes (slope-timed, checksum
readback; run ALONE on the TPU).

Variants, each a full CMux step scanned s1/s2 times:
  twocall  — production: rot_diff_digits + extprod_step2
  onecall  — extprod_step2g (glue fused into the dot kernel finish)
  fw       — extprod_step2 with first-writer bucket assignment at r==0
             (kills the 5x [8,B,N] zero-init + first RMW read per step)
  mstack   — 7 dots [n_d·B, N] x [N, N] (digit limbs stacked along M via a
             free reshape of the dig block; halves per-dot overhead without
             the desc-scratch store cost)
  fwmstack — fw + mstack combined

Env: P10_WHICH (csv), P10_BATCH (512), P10_S1/P10_S2 (8/40).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[p10 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.pallas import extprod

    B = int(os.environ.get("P10_BATCH", "512"))
    s1 = int(os.environ.get("P10_S1", "8"))
    s2 = int(os.environ.get("P10_S2", "40"))
    which = os.environ.get(
        "P10_WHICH", "twocall,onecall,fw,mstack,fwmstack").split(",")
    n_d, k1, L, N, j_start = 2, 5, 3, 512, 1
    R = k1 * L
    j_cnt = 8 - j_start
    base_log = 12

    rng = np.random.default_rng(0)
    ext_or = jnp.asarray(
        rng.integers(-127, 128, (k1, R, j_cnt, 2 * N), dtype=np.int8))
    acc0 = jnp.asarray(
        rng.integers(0, 1 << 32, (k1, 2, B, N), dtype=np.uint32))
    t_all = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int32))

    # ---- fw / mstack kernel bodies (variants of _kernel_grid_fused) ----
    def dots_variant(first_assign: bool, mstack: bool,
                     n: int, dig_ref, ext_ref, part_ref):
        js_all = list(range(j_start, 8))
        first_of = {}
        for j in js_all:
            for i in range(n_d):
                s = i + j
                if s < 8 and s not in first_of:
                    first_of[s] = (j, i)
        for g in range(0, len(js_all), 4):
            js = js_all[g: g + 4]
            row = None
            for p_i, j in enumerate(js):
                b8 = ext_ref[0, 0, j - j_start: j - j_start + 1, :]
                word = (b8.astype(jnp.int32) & 0xFF) << (8 * p_i)
                row = word if row is None else row | word
            packed = extprod._nc_rows(row, n)[:, :n]
            for p_i, j in enumerate(js):
                ncm = ((packed << (24 - 8 * p_i)) >> 24).astype(jnp.int8)
                if mstack:
                    lhs = dig_ref[0].reshape(n_d * dig_ref.shape[2], n)
                    c2 = jnp.dot(lhs, ncm,
                                 preferred_element_type=jnp.int32)
                    bt = dig_ref.shape[2]
                    for i in range(n_d):
                        s = i + j
                        if s >= 8:
                            continue
                        c = c2[i * bt: (i + 1) * bt]
                        if first_assign and first_of[s] == (j, i):
                            part_ref[s] = c
                        else:
                            part_ref[s] = part_ref[s] + c
                else:
                    for i in range(n_d):
                        s = i + j
                        if s >= 8:
                            continue
                        c = jnp.dot(dig_ref[0, i], ncm,
                                    preferred_element_type=jnp.int32)
                        if first_assign and first_of[s] == (j, i):
                            part_ref[s] = c
                        else:
                            part_ref[s] = part_ref[s] + c

    def make_kern(fw: bool, mstack: bool):
        def kern(dig_ref, ext_ref, acc_ref, out_ref, part_ref):
            r = pl.program_id(2)
            if fw:
                @pl.when(r == 0)
                def _first():
                    dots_variant(True, mstack, N, dig_ref, ext_ref, part_ref)

                @pl.when(r != 0)
                def _rest():
                    dots_variant(False, mstack, N, dig_ref, ext_ref, part_ref)
            else:
                @pl.when(r == 0)
                def _init():
                    part_ref[...] = jnp.zeros_like(part_ref)
                dots_variant(False, mstack, N, dig_ref, ext_ref, part_ref)

            @pl.when(r == R - 1)
            def _f():
                lo, hi = extprod._recombine(
                    j_start, acc_ref[0, 0], acc_ref[0, 1], part_ref)
                out_ref[0, 0] = lo
                out_ref[0, 1] = hi
        return kern

    def make_step(fw: bool, mstack: bool):
        kern = make_kern(fw, mstack)

        def step(dig, acc):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    grid=(1, k1, R),
                    in_specs=[
                        pl.BlockSpec((1, n_d, B, N),
                                     lambda bb, oo, rr: (rr, 0, bb, 0)),
                        pl.BlockSpec((1, 1, j_cnt, 2 * N),
                                     lambda bb, oo, rr: (oo, rr, 0, 0)),
                        pl.BlockSpec((1, 2, B, N),
                                     lambda bb, oo, rr: (oo, 0, bb, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 2, B, N),
                                           lambda bb, oo, rr: (oo, 0, bb, 0)),
                    out_shape=jax.ShapeDtypeStruct((k1, 2, B, N), jnp.uint32),
                    scratch_shapes=[pltpu.VMEM((8, B, N), jnp.int32)],
                    input_output_aliases={2: 0},
                )(dig, ext_or, acc)
        return step

    def full_twocall(acc):
        dig = extprod.rot_diff_digits(acc, t_all, base_log, L, n_d)
        return extprod.extprod_step2(dig, ext_or, acc, j_start=j_start)

    def full_onecall_mk():
        dig0 = extprod.rot_diff_digits(acc0, t_all, base_log, L, n_d)
        dig0 = dig0.reshape(k1, L, n_d, B, N)

        def step(carry):
            acc, dig = carry
            acc, dig = extprod.extprod_step2g(
                dig, ext_or, acc, t_all, base_log=base_log, levels=L,
                j_start=j_start)
            return (acc, dig)
        return step, (acc0, dig0)

    def mk_variant_step(fw, mstack):
        inner = make_step(fw, mstack)

        def step(acc):
            dig = extprod.rot_diff_digits(acc, t_all, base_log, L, n_d)
            return inner(dig, acc)
        return step

    variants = {}
    variants["twocall"] = (full_twocall, acc0)
    variants["fw"] = (mk_variant_step(True, False), acc0)
    variants["mstack"] = (mk_variant_step(False, True), acc0)
    variants["fwmstack"] = (mk_variant_step(True, True), acc0)

    ref_out = None
    for name in which:
        if name == "onecall":
            step, carry0 = full_onecall_mk()

            def mk(steps, step=step, carry0=carry0):
                @jax.jit
                def run():
                    def body(c, _):
                        return step(c), None
                    (acc, _), _ = jax.lax.scan(body, carry0, None,
                                               length=steps)
                    return jnp.sum(acc, dtype=jnp.uint32)
                return run

            def mk_full(steps, step=step, carry0=carry0):
                @jax.jit
                def run():
                    def body(c, _):
                        return step(c), None
                    (acc, _), _ = jax.lax.scan(body, carry0, None,
                                               length=steps)
                    return acc
                return run
        else:
            step, a0 = variants[name]

            def mk(steps, step=step, a0=a0):
                @jax.jit
                def run():
                    def body(acc, _):
                        return step(acc), None
                    acc, _ = jax.lax.scan(body, a0, None, length=steps)
                    return jnp.sum(acc, dtype=jnp.uint32)
                return run

            def mk_full(steps, step=step, a0=a0):
                @jax.jit
                def run():
                    def body(acc, _):
                        return step(acc), None
                    acc, _ = jax.lax.scan(body, a0, None, length=steps)
                    return acc
                return run

        times = {}
        for steps in (s1, s2):
            run = mk(steps)
            t0 = time.time()
            np.asarray(jax.block_until_ready(run()))
            first = time.time() - t0
            ts = []
            for _ in range(7):
                t0 = time.time()
                np.asarray(jax.block_until_ready(run()))
                ts.append(time.time() - t0)
            times[steps] = min(ts)
            log(f"{name} x{steps}: first {first:.1f}s steady "
                f"{times[steps]*1e3:.1f}ms")
        slope = (times[s2] - times[s1]) / (s2 - s1)
        log(f"{name}: marginal {slope*1e3:.3f}ms/step")

        out = np.asarray(jax.block_until_ready(mk_full(s1)()))
        if name == "twocall":
            ref_out = out
        elif ref_out is not None:
            log(f"{name}: matches twocall = {np.array_equal(out, ref_out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
