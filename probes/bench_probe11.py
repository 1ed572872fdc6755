"""Cell-granularity probe for the CMux kernel: is the 13-dot floor's gap to
dot speed-of-light per-cell overhead? Compare the production grid (75 cells
per step) against coarser cells that process 3 or all 15 decomposition rows
per (o,·) cell. Slope-timed, checksum readback; run ALONE on the TPU.

  base — production extprod_step2 (grid (1, O, R), 13 dots/cell)
  r3   — grid (1, O, 5): 3 rows per cell (39 dots/cell, 25 cells)
  rall — grid (1, O): all 15 rows per cell (195 dots/cell, 5 cells)

Env: P11_WHICH, P11_BATCH (512), P11_S1/P11_S2 (64/320).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[p11 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.pallas import extprod

    B = int(os.environ.get("P11_BATCH", "512"))
    s1 = int(os.environ.get("P11_S1", "64"))
    s2 = int(os.environ.get("P11_S2", "320"))
    which = os.environ.get("P11_WHICH", "base,r3,rall").split(",")
    n_d, R, O, N, j_start = 2, 15, 5, 512, 1
    j_cnt = 8 - j_start

    rng = np.random.default_rng(0)
    dig_rf = jnp.asarray(
        rng.integers(-127, 128, (R, n_d, B, N), dtype=np.int8))
    ext_or = jnp.asarray(
        rng.integers(-127, 128, (O, R, j_cnt, 2 * N), dtype=np.int8))
    acc0 = jnp.asarray(
        rng.integers(0, 1 << 32, (O, 2, B, N), dtype=np.uint32))

    def make_rgroup_kern(rg: int, n_cells: int):
        def kern(dig_ref, ext_ref, acc_ref, out_ref, part_ref):
            rc = pl.program_id(2)

            @pl.when(rc == 0)
            def _init():
                part_ref[...] = jnp.zeros_like(part_ref)

            for rr in range(rg):
                def ext_at(j_lo, j_hi, rr=rr):
                    return ext_ref[0, rr, j_lo:j_hi, :]
                js_all = [j for j in range(j_start, 8)
                          if any(i + j < 8 for i in range(n_d))]
                for g in range(0, len(js_all), 4):
                    js = js_all[g: g + 4]
                    row = None
                    for p_i, j in enumerate(js):
                        b8 = ext_at(j - j_start, j - j_start + 1)
                        word = (b8.astype(jnp.int32) & 0xFF) << (8 * p_i)
                        row = word if row is None else row | word
                    packed = extprod._nc_rows(row, N)[:, :N]
                    for p_i, j in enumerate(js):
                        ncm = ((packed << (24 - 8 * p_i)) >> 24).astype(
                            jnp.int8)
                        for i in range(n_d):
                            s = i + j
                            if s >= 8:
                                continue
                            part_ref[s] = part_ref[s] + jnp.dot(
                                dig_ref[rr, i], ncm,
                                preferred_element_type=jnp.int32)

            @pl.when(rc == n_cells - 1)
            def _f():
                lo, hi = extprod._recombine(
                    j_start, acc_ref[0, 0], acc_ref[0, 1], part_ref)
                out_ref[0, 0] = lo
                out_ref[0, 1] = hi
        return kern

    def make_step(rg: int):
        n_cells = R // rg
        assert n_cells * rg == R
        kern = make_rgroup_kern(rg, n_cells)

        def step(acc):
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    grid=(1, O, n_cells),
                    in_specs=[
                        pl.BlockSpec((rg, n_d, B, N),
                                     lambda bb, oo, rc: (rc, 0, bb, 0)),
                        pl.BlockSpec((1, rg, j_cnt, 2 * N),
                                     lambda bb, oo, rc: (oo, rc, 0, 0)),
                        pl.BlockSpec((1, 2, B, N),
                                     lambda bb, oo, rc: (oo, 0, bb, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 2, B, N),
                                           lambda bb, oo, rc: (oo, 0, bb, 0)),
                    out_shape=jax.ShapeDtypeStruct((O, 2, B, N), jnp.uint32),
                    scratch_shapes=[pltpu.VMEM((8, B, N), jnp.int32)],
                    input_output_aliases={2: 0},
                )(dig_rf, ext_or, acc)
        return step

    def base_step(acc):
        return extprod.extprod_step2(dig_rf, ext_or, acc, j_start=j_start)

    variants = {"base": base_step, "r3": make_step(3), "rall": make_step(15)}

    ref_out = None
    for name in which:
        step = variants[name]

        def mk(steps, step=step, full=False):
            @jax.jit
            def run(acc):
                def body(acc, _):
                    return step(acc), None
                out, _ = jax.lax.scan(body, acc, None, length=steps)
                return out if full else jnp.sum(out, dtype=jnp.uint32)
            return run

        times = {}
        for steps in (s1, s2):
            run = mk(steps)
            t0 = time.time()
            np.asarray(jax.block_until_ready(run(acc0)))
            first = time.time() - t0
            ts = []
            for _ in range(5):
                t0 = time.time()
                np.asarray(jax.block_until_ready(run(acc0)))
                ts.append(time.time() - t0)
            times[steps] = min(ts)
            log(f"{name} x{steps}: first {first:.1f}s steady "
                f"{times[steps]*1e3:.1f}ms")
        slope = (times[s2] - times[s1]) / (s2 - s1)
        log(f"{name}: marginal {slope*1e3:.3f}ms/step")

        out = np.asarray(jax.block_until_ready(mk(s1, step, True)(acc0)))
        if name == "base":
            ref_out = out
        elif ref_out is not None:
            log(f"{name}: matches base = {np.array_equal(out, ref_out)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
