"""longk2: long-K bucket dots with HOISTED packed negacirculant builds.

The (o, r)-grid production kernel pays ~11 bucket-scratch read-modify-writes
per cell x 75 cells = ~5GB/step of VMEM RMW traffic at B=1024 (the dominant
non-dot cost; mstack2 proved the cost is traffic, not op count). The longk
kernel killed that traffic by stacking the R negacirculants into one
[R*N, N] operand per (o, BSK-plane j) — ONE MXU-internal K-accumulation per
bucket instead of 15 RMWs — but it rebuilt the NC stack in EVERY (o, j) cell
(90 unpacked ladders per o, 450/step vs the grid kernel's 150 packed) and
measured 4.3ms/step.

longk2 = longk with the builds hoisted and packed: grid (bt, o, j); at
jj == 0 build ALL j planes of the R rows into a [j_cnt, R*N, N] int8 scratch
via the 4-planes-per-int32 packed ladders (30 ladders per o — same build
count as the production grid kernel), then each jj cell runs <= n_d long-K
dots with first-writer bucket init.

Variants (P12_WHICH csv; P12_BATCH default 1024, P12_STEPS, P12_JS
default 2):
  step2        — production (o, r)-grid kernel (extprod_step2, max_tile=B)
  longk2       — as described
  longk2-nonc  — longk2 with builds removed (dots on stale scratch)
  longk2-nodot — longk2 with dots removed (builds + fini only)

Run ALONE on the TPU. Production shapes N=512, R=15, O=5, n_d=2.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[p12 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.pallas import extprod

    B = int(os.environ.get("P12_BATCH", "1024"))
    steps = int(os.environ.get("P12_STEPS", "32"))
    j_start = int(os.environ.get("P12_JS", "2"))
    which = os.environ.get(
        "P12_WHICH", "step2,longk2,longk2-nonc,longk2-nodot").split(",")
    n_d, R, O, N = 2, 15, 5, 512
    j_cnt = 8 - j_start

    rng = np.random.default_rng(0)
    dig_rf = jnp.asarray(
        rng.integers(-127, 128, (R, n_d, B, N), dtype=np.int8))
    dig_flat = jnp.asarray(
        rng.integers(-127, 128, (n_d, B, R * N), dtype=np.int8))
    ext_or = jnp.asarray(
        rng.integers(-127, 128, (O, R, j_cnt, 2 * N), dtype=np.int8))
    acc0 = jnp.asarray(
        rng.integers(0, 1 << 32, (O, 2, B, N), dtype=np.uint32))

    def scan_of(step_fn):
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

    def make_longk2(do_dots: bool, do_nc: bool):
        def kern(dig_ref, ext_ref, acc_ref, out_ref, nc_ref, part_ref):
            jj = pl.program_id(2)

            if do_nc:
                @pl.when(jj == 0)
                def _build():
                    # all j planes of all R rows, 4 planes per int32 ladder
                    for r in range(R):
                        for j, ncm in extprod._packed_nc_planes(
                                N, list(range(j_start, 8)),
                                lambda j, r=r: ext_ref[
                                    0, r, j - j_start: j - j_start + 1, :]):
                            nc_ref[j - j_start, r * N: (r + 1) * N, :] = ncm

            if do_dots:
                for j_val in range(j_start, 8):
                    @pl.when(jj == j_val - j_start)
                    def _dots(j_val=j_val):
                        for i in range(n_d):
                            s = j_val + i
                            if s >= 8:
                                continue
                            c = jnp.dot(
                                dig_ref[i], nc_ref[j_val - j_start],
                                preferred_element_type=jnp.int32)
                            # first writer of bucket s
                            if j_val == max(j_start, s - n_d + 1):
                                part_ref[s] = c
                            else:
                                part_ref[s] = part_ref[s] + c

            @pl.when(jj == j_cnt - 1)
            def _fini():
                lo, hi = extprod._recombine(
                    j_start, acc_ref[0, 0], acc_ref[0, 1], part_ref)
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
                        pl.BlockSpec((1, R, j_cnt, 2 * N),
                                     lambda bb, oo, jj: (oo, 0, 0, 0)),
                        pl.BlockSpec((1, 2, B, N),
                                     lambda bb, oo, jj: (oo, 0, bb, 0)),
                    ],
                    out_specs=pl.BlockSpec((1, 2, B, N),
                                           lambda bb, oo, jj: (oo, 0, bb, 0)),
                    out_shape=jax.ShapeDtypeStruct((O, 2, B, N), jnp.uint32),
                    scratch_shapes=[
                        pltpu.VMEM((j_cnt, R * N, N), jnp.int8),
                        pltpu.VMEM((8, B, N), jnp.int32)],
                    input_output_aliases={2: 0},
                )(dig_flat, ext_or, acc)
        return step

    if "step2" in which:
        step2 = lambda acc: extprod.extprod_step2(
            dig_rf, ext_or, acc, j_start=j_start, max_tile=B)
        timeit("step2", scan_of(step2), acc0)
    if "longk2" in which:
        timeit("longk2", scan_of(make_longk2(True, True)), acc0)
    if "longk2-nonc" in which:
        timeit("longk2-nonc", scan_of(make_longk2(True, False)), acc0)
    if "longk2-nodot" in which:
        timeit("longk2-nodot", scan_of(make_longk2(False, True)), acc0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
