"""Negacirculant-build / bucket-accumulate strategy shootout inside the
production CMux kernel, with slope-based timing (two scan lengths) so the
~60ms fixed tunnel dispatch cancels out. Run ALONE on the TPU — concurrent
programs contaminate each other's timings.

Variants (full (bt, o, r) fused kernel):
  base       — production _kernel_grid_fused: 7 value-ladder NC builds,
               13 [B,N]x[N,N] dots, 13 bucket RMWs per cell
  nobuild    — dots read ONE prebuilt scratch NC (floor: MXU + RMW, no ladders)
  nodot      — ladders only (VPU build cost in isolation)
  bucketdesc — NC planes built once into a descending [8N, N] scratch
               (NC_7..NC_0-zeros); per bucket s ONE [B,2N]x[2N,N] dot with
               shared LHS [dig0|dig1] (7 dots, 7 RMWs, bigger K)
  packed     — 4 j-planes packed into int32 lanes, one ladder per group

Env: P9_WHICH (csv), P9_BATCH (default 512), P9_S1/P9_S2 (default 8/40).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[p9 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.pallas import extprod

    B = int(os.environ.get("P9_BATCH", "512"))
    s1 = int(os.environ.get("P9_S1", "8"))
    s2 = int(os.environ.get("P9_S2", "40"))
    which = os.environ.get(
        "P9_WHICH", "base,nobuild,nodot,bucketdesc,packed").split(",")
    n_d, R, O, N, j_start = 2, 15, 5, 512, 1
    j_cnt = 8 - j_start

    rng = np.random.default_rng(0)
    dig_rf = jnp.asarray(
        rng.integers(-127, 128, (R, n_d, B, N), dtype=np.int8))
    # bucketdesc consumes the column-concat layout [R, B, n_d*N]
    dig_cat = jnp.asarray(np.concatenate(
        [np.asarray(dig_rf[:, 0]), np.asarray(dig_rf[:, 1])], axis=-1))
    ext_or = jnp.asarray(
        rng.integers(-127, 128, (O, R, j_cnt, 2 * N), dtype=np.int8))
    acc0 = jnp.asarray(
        rng.integers(0, 1 << 32, (O, 2, B, N), dtype=np.uint32))

    def fini(j_lo, acc_ref, out_ref, part_ref):
        lo = acc_ref[0, 0]
        hi = acc_ref[0, 1]
        for s in range(j_lo, 8):
            val = part_ref[s]
            v_lo = val.astype(jnp.uint32)
            v_hi = (val >> 31).astype(jnp.uint32)
            sh = 8 * s
            if sh == 0:
                c_lo, c_hi = v_lo, v_hi
            elif sh < 32:
                c_lo = v_lo << jnp.uint32(sh)
                c_hi = (v_hi << jnp.uint32(sh)) | (v_lo >> jnp.uint32(32 - sh))
            else:
                c_lo = jnp.zeros_like(v_lo)
                c_hi = v_lo << jnp.uint32(sh - 32)
            s_lo = lo + c_lo
            carry = (s_lo < lo).astype(jnp.uint32)
            lo, hi = s_lo, hi + c_hi + carry
        out_ref[0, 0] = lo
        out_ref[0, 1] = hi

    # ---------------- kernel bodies ----------------
    def kern_nobuild(dig_ref, ext_ref, acc_ref, out_ref, part_ref, nc_ref):
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            part_ref[...] = jnp.zeros_like(part_ref)
            nc_ref[0:1, :] = ext_ref[0, 0, 0:1, :N]

        ncm = nc_ref[...]
        for j in range(j_start, 8):
            for i in range(n_d):
                s = i + j
                if s >= 8:
                    continue
                part_ref[s] = part_ref[s] + jnp.dot(
                    dig_ref[0, i], ncm, preferred_element_type=jnp.int32)

        @pl.when(r == R - 1)
        def _f():
            fini(j_start, acc_ref, out_ref, part_ref)

    def kern_nodot(dig_ref, ext_ref, acc_ref, out_ref, part_ref):
        tot = None
        for j in range(j_start, 8):
            ncm = extprod._nc_rows(
                ext_ref[0, 0, j - j_start: j - j_start + 1, :], N)[:, :N]
            c = ncm[0:1, :].astype(jnp.int32)
            tot = c if tot is None else tot + c
        # keep the ladders alive: fold one row into the output
        out_ref[0, 0] = acc_ref[0, 0] + tot.astype(jnp.uint32)
        out_ref[0, 1] = acc_ref[0, 1]

    def kern_bucketdesc(dig_ref, ext_ref, acc_ref, out_ref, part_ref, nc_ref):
        r = pl.program_id(2)
        o = pl.program_id(1)

        @pl.when(r == 0)
        def _init():
            part_ref[...] = jnp.zeros_like(part_ref)

        @pl.when((r == 0) & (o == 0))
        def _zero_nc0():
            nc_ref[7 * N: 8 * N, :] = jnp.zeros((N, N), jnp.int8)

        # build NC_j once, descending: row block t = NC_{7-t}
        for j in range(j_start, 8):
            ncm = extprod._nc_rows(
                ext_ref[0, 0, j - j_start: j - j_start + 1, :], N)[:, :N]
            nc_ref[(7 - j) * N: (8 - j) * N, :] = ncm

        lhs = dig_ref[0]                                       # [B, 2N]
        for s in range(j_start, 8):
            w = nc_ref[(7 - s) * N: (9 - s) * N, :]            # [2N, N]
            part_ref[s] = part_ref[s] + jnp.dot(
                lhs, w, preferred_element_type=jnp.int32)

        @pl.when(r == R - 1)
        def _f():
            fini(j_start, acc_ref, out_ref, part_ref)

    def kern_nobuild2(dig_ref, ext_ref, acc_ref, out_ref, part_ref, nc_ref):
        # floor for the bucketdesc structure: 7 dots K=2N + 7 RMW, no builds
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            part_ref[...] = jnp.zeros_like(part_ref)
            nc_ref[0:1, :] = ext_ref[0, 0, 0:1, :N]

        lhs = dig_ref[0]                                       # [B, 2N]
        for s in range(j_start, 8):
            w = nc_ref[(7 - s) * N: (9 - s) * N, :]            # [2N, N]
            part_ref[s] = part_ref[s] + jnp.dot(
                lhs, w, preferred_element_type=jnp.int32)

        @pl.when(r == R - 1)
        def _f():
            fini(j_start, acc_ref, out_ref, part_ref)

    def kern_packeddesc(dig_ref, ext_ref, acc_ref, out_ref, part_ref,
                        nc_ref):
        # packed int32 ladders unpacked straight into the descending scratch,
        # then the 7 shared-LHS K=2N bucket dots
        r = pl.program_id(2)
        o = pl.program_id(1)

        @pl.when(r == 0)
        def _init():
            part_ref[...] = jnp.zeros_like(part_ref)

        @pl.when((r == 0) & (o == 0))
        def _zero_nc0():
            nc_ref[7 * N: 8 * N, :] = jnp.zeros((N, N), jnp.int8)

        groups = [list(range(j_start + 4 * g, min(8, j_start + 4 * g + 4)))
                  for g in range((j_cnt + 3) // 4)]
        for js in groups:
            row = jnp.zeros((1, 2 * N), jnp.int32)
            for p_i, j in enumerate(js):
                b8 = ext_ref[0, 0, j - j_start: j - j_start + 1, :]
                row = row | ((b8.astype(jnp.int32) & 0xFF) << (8 * p_i))
            m = row
            size = 1
            while size < N:
                rolled = jnp.concatenate(
                    [m[..., -size:], m[..., :-size]], axis=-1)
                m = jnp.concatenate([m, rolled], axis=0)
                size *= 2
            mn = m[:, :N]                                      # [N, N] i32
            for p_i, j in enumerate(js):
                nc_ref[(7 - j) * N: (8 - j) * N, :] = (
                    (mn << (24 - 8 * p_i)) >> 24).astype(jnp.int8)

        lhs = dig_ref[0]                                       # [B, 2N]
        for s in range(j_start, 8):
            w = nc_ref[(7 - s) * N: (9 - s) * N, :]            # [2N, N]
            part_ref[s] = part_ref[s] + jnp.dot(
                lhs, w, preferred_element_type=jnp.int32)

        @pl.when(r == R - 1)
        def _f():
            fini(j_start, acc_ref, out_ref, part_ref)

    def kern_packed(dig_ref, ext_ref, acc_ref, out_ref, part_ref):
        r = pl.program_id(2)

        @pl.when(r == 0)
        def _init():
            part_ref[...] = jnp.zeros_like(part_ref)

        groups = [list(range(j_start + 4 * g, min(8, j_start + 4 * g + 4)))
                  for g in range((j_cnt + 3) // 4)]
        for js in groups:
            row = jnp.zeros((1, 2 * N), jnp.int32)
            for p_i, j in enumerate(js):
                b8 = ext_ref[0, 0, j - j_start: j - j_start + 1, :]
                row = row | ((b8.astype(jnp.int32) & 0xFF) << (8 * p_i))
            m = row
            size = 1
            while size < N:
                rolled = jnp.concatenate(
                    [m[..., -size:], m[..., :-size]], axis=-1)
                m = jnp.concatenate([m, rolled], axis=0)
                size *= 2
            mn = m[:, :N]                                      # [N, N] i32
            for p_i, j in enumerate(js):
                ncm = ((mn << (24 - 8 * p_i)) >> 24).astype(jnp.int8)
                for i in range(n_d):
                    s = i + j
                    if s >= 8:
                        continue
                    part_ref[s] = part_ref[s] + jnp.dot(
                        dig_ref[0, i], ncm, preferred_element_type=jnp.int32)

        @pl.when(r == R - 1)
        def _f():
            fini(j_start, acc_ref, out_ref, part_ref)

    def make_step(body, extra_scratch, dig=dig_rf, dig_spec=None):
        scratch = [pltpu.VMEM((8, B, N), jnp.int32)] + extra_scratch
        if dig_spec is None:
            dig_spec = pl.BlockSpec((1, n_d, B, N),
                                    lambda bb, oo, rr: (rr, 0, bb, 0))

        def step(acc):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    body,
                    grid=(1, O, R),
                    in_specs=[
                        dig_spec,
                        pl.BlockSpec((1, 1, j_cnt, 2 * N),
                                     lambda bb, oo, rr: (oo, rr, 0, 0)),
                        pl.BlockSpec((1, 2, B, N),
                                     lambda bb, oo, rr: (oo, 0, bb, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 2, B, N),
                                           lambda bb, oo, rr: (oo, 0, bb, 0)),
                    out_shape=jax.ShapeDtypeStruct((O, 2, B, N), jnp.uint32),
                    scratch_shapes=scratch,
                    input_output_aliases={2: 0},
                )(dig, ext_or, acc)
        return step

    def prod_step(acc):
        kern = functools.partial(extprod._kernel_grid_fused, n_d, N, R,
                                 j_start, 1, False)
        with jax.enable_x64(False):
            return pl.pallas_call(
                kern,
                grid=(1, O, R),
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
                out_shape=jax.ShapeDtypeStruct((O, 2, B, N), jnp.uint32),
                scratch_shapes=[pltpu.VMEM((8, B, N), jnp.int32)],
                input_output_aliases={2: 0},
            )(dig_rf, ext_or, acc)

    variants = {
        "base": prod_step,
        "nobuild": make_step(kern_nobuild, [pltpu.VMEM((N, N), jnp.int8)]),
        "nodot": make_step(kern_nodot, []),
        "bucketdesc": make_step(
            kern_bucketdesc, [pltpu.VMEM((8 * N, N), jnp.int8)],
            dig=dig_cat,
            dig_spec=pl.BlockSpec((1, B, n_d * N),
                                  lambda bb, oo, rr: (rr, bb, 0))),
        "nobuild2": make_step(
            kern_nobuild2, [pltpu.VMEM((8 * N, N), jnp.int8)],
            dig=dig_cat,
            dig_spec=pl.BlockSpec((1, B, n_d * N),
                                  lambda bb, oo, rr: (rr, bb, 0))),
        "packeddesc": make_step(
            kern_packeddesc, [pltpu.VMEM((8 * N, N), jnp.int8)],
            dig=dig_cat,
            dig_spec=pl.BlockSpec((1, B, n_d * N),
                                  lambda bb, oo, rr: (rr, bb, 0))),
        "packed": make_step(kern_packed, []),
    }

    ref_out = None
    for name in which:
        step = variants[name]

        def mk(steps, step=step):
            # checksum readback: the full acc is 10.5MB, and tunnel readback
            # variance (~hundreds of ms) would swamp the timing signal
            @jax.jit
            def run(acc):
                def body(acc, _):
                    return step(acc), None
                out, _ = jax.lax.scan(body, acc, None, length=steps)
                return jnp.sum(out, dtype=jnp.uint32)
            return run

        def mk_full(steps, step=step):
            @jax.jit
            def run(acc):
                def body(acc, _):
                    return step(acc), None
                out, _ = jax.lax.scan(body, acc, None, length=steps)
                return out
            return run

        times = {}
        for steps in (s1, s2):
            run = mk(steps)
            t0 = time.time()
            np.asarray(jax.block_until_ready(run(acc0)))
            first = time.time() - t0
            ts = []
            for _ in range(7):
                t0 = time.time()
                np.asarray(jax.block_until_ready(run(acc0)))
                ts.append(time.time() - t0)
            times[steps] = min(ts)
            log(f"{name} x{steps}: first {first:.1f}s steady "
                f"{times[steps]*1e3:.1f}ms")
        slope = (times[s2] - times[s1]) / (s2 - s1)
        log(f"{name}: marginal {slope*1e3:.3f}ms/step")
        if name in ("base", "bucketdesc", "packed", "packeddesc"):
            out = np.asarray(jax.block_until_ready(mk_full(s1)(acc0)))
            if name == "base":
                ref_out = out
            elif ref_out is not None:
                log(f"{name}: matches base = {np.array_equal(out, ref_out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
