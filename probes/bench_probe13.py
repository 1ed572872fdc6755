"""Dissect the PRODUCTION CMux step (gridg kernel) at production shapes.

The bench runs extprod_step2g (one pallas call per step: packed-ladder NC
builds + 11 int8 dots with bucket RMWs + u64 recombine + next-step glue) at
B=1024, js=2, bt=1024 — 1.49 ms/step, vs a ~0.88 ms 11-dot MXU floor. This
probe toggles the kernel's components to attribute the 0.6 ms gap:

  full      — the kernel as shipped (baseline)
  noglue    — skip the fused next-step glue (rot ladder/diff/decompose/split)
  nodots    — NC ladders built and consumed, dots+RMWs skipped
  overwrite — dots written to their bucket WITHOUT the read-add (RMW read
              cost shows as full - overwrite - ...)
  nobuild   — dots against one stale ladder (builds cost by difference)

Timing: slope between P13_STEPS_LO and P13_STEPS_HI scan lengths (default
64/320) with a small sliced readback; run ALONE on the TPU.
Env: P13_WHICH, P13_BATCH (1024), P13_JS (2).
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[p13 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.pallas import extprod

    B = int(os.environ.get("P13_BATCH", "1024"))
    j_start = int(os.environ.get("P13_JS", "2"))
    lo_steps = int(os.environ.get("P13_STEPS_LO", "64"))
    hi_steps = int(os.environ.get("P13_STEPS_HI", "320"))
    which = os.environ.get(
        "P13_WHICH", "full,noglue,nodots,overwrite,nobuild").split(",")
    n_d, levels, k1, N = 2, 3, 5, 512
    base_log = 12
    R = k1 * levels
    j_cnt = 8 - j_start

    rng = np.random.default_rng(0)
    dig0 = jnp.asarray(rng.integers(-127, 128, (k1, levels, n_d, B, N),
                                    dtype=np.int8))
    ext_or = jnp.asarray(rng.integers(-127, 128, (k1, R, j_cnt, 2 * N),
                                      dtype=np.int8))
    acc0 = jnp.asarray(rng.integers(0, 1 << 32, (k1, 2, B, N),
                                    dtype=np.uint32))
    t0v = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int32))

    def make_kernel(do_glue, do_dots, do_rmw, do_build):
        def kern(t_ref, dig_ref, ext_ref, acc_ref,
                 out_ref, dig_out_ref, part_ref):
            r = pl.program_id(2)

            @pl.when(r == 0)
            def _init():
                part_ref[...] = jnp.zeros_like(part_ref)

            js_all = [j for j in range(j_start, 8)
                      if any(i + j < 8 for i in range(n_d))]
            if do_build:
                planes = extprod._packed_nc_planes(
                    N, js_all, lambda j: ext_ref[0, 0, j - j_start: j + 1
                                                 - j_start, :])
            else:
                # one stale ladder reused for every j (measures builds by
                # difference; MACs identical)
                stale = extprod._nc_rows(
                    ext_ref[0, 0, 0:1, :].astype(jnp.int32), N)[:, :N]
                stale = stale.astype(jnp.int8)
                planes = ((j, stale) for j in js_all)
            for j, ncm in planes:
                if not do_dots:
                    # keep the ladder alive without MXU work or RMW
                    part_ref[0, 0:1] = ncm[0:1, :].astype(jnp.int32)
                    continue
                for i in range(n_d):
                    s = i + j
                    if s >= 8:
                        continue
                    contrib = jnp.dot(dig_ref[0, 0, i], ncm,
                                      preferred_element_type=jnp.int32)
                    if do_rmw:
                        part_ref[s] = part_ref[s] + contrib
                    else:
                        part_ref[s] = contrib

            @pl.when(r == R - 1)
            def _fini():
                lo, hi = extprod._recombine(
                    j_start, acc_ref[0, 0], acc_ref[0, 1], part_ref)
                out_ref[0, 0] = lo
                out_ref[0, 1] = hi
                if do_glue:
                    def write_plane(l, i, p):
                        dig_out_ref[0, l, i] = p
                    extprod._glue_body(N, base_log, levels, n_d, lo, hi,
                                       t_ref[...], write_plane)
                else:
                    dig_out_ref[0, 0, 0] = lo.astype(jnp.int8)

        @jax.jit
        def step(acc, dig, t):
            t2 = t.reshape(B, 1).astype(jnp.int32)
            with jax.enable_x64(False):
                return pl.pallas_call(
                    kern,
                    grid=(1, k1, R),
                    in_specs=[
                        pl.BlockSpec((B, 1), lambda bb, oo, rr: (bb, 0)),
                        pl.BlockSpec((1, 1, n_d, B, N),
                                     lambda bb, oo, rr: (rr // levels,
                                                         rr % levels,
                                                         0, bb, 0)),
                        pl.BlockSpec((1, 1, j_cnt, 2 * N),
                                     lambda bb, oo, rr: (oo, rr, 0, 0)),
                        pl.BlockSpec((1, 2, B, N),
                                     lambda bb, oo, rr: (oo, 0, bb, 0)),
                    ],
                    out_specs=[
                        pl.BlockSpec((1, 2, B, N),
                                     lambda bb, oo, rr: (oo, 0, bb, 0)),
                        pl.BlockSpec((1, levels, n_d, B, N),
                                     lambda bb, oo, rr: (oo, 0, 0, bb, 0)),
                    ],
                    out_shape=[
                        jax.ShapeDtypeStruct((k1, 2, B, N), jnp.uint32),
                        jax.ShapeDtypeStruct((k1, levels, n_d, B, N),
                                             jnp.int8),
                    ],
                    scratch_shapes=[pltpu.VMEM((8, B, N), jnp.int32)],
                    input_output_aliases={3: 0},
                )(t2, dig, ext_or, acc)
        return step

    def scan_of(step_fn, steps):
        @jax.jit
        def run(acc, dig, t):
            def body(carry, _):
                acc, dig = carry
                acc, dig = step_fn(acc, dig, t)
                return (acc, dig), None
            (acc, dig), _ = jax.lax.scan(body, (acc, dig), None,
                                         length=steps)
            return acc[:, :, :1, :8], dig[:, :, :, :1, :8]
        return run

    def slope(name, mk):
        ts = {}
        def force(out):
            return [np.asarray(x) for x in out]   # tunnel-safe sync

        for steps in (lo_steps, hi_steps):
            fn = scan_of(mk, steps)
            force(fn(acc0, dig0, t0v))            # compile
            best = None
            for _ in range(3):
                t0 = time.time()
                force(fn(acc0, dig0, t0v))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            ts[steps] = best
        ms = (ts[hi_steps] - ts[lo_steps]) / (hi_steps - lo_steps) * 1000
        log(f"{name}: {ms:.3f} ms/step  (lo {ts[lo_steps]*1000:.0f}ms, "
            f"hi {ts[hi_steps]*1000:.0f}ms)")

    variants = {
        "full": (True, True, True, True),
        "noglue": (False, True, True, True),
        "nodots": (True, False, True, True),
        "overwrite": (True, True, False, True),
        "nobuild": (True, True, True, False),
    }
    for name in which:
        slope(name, make_kernel(*variants[name]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
