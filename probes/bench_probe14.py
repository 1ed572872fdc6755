"""Software-pipelined negacirculant builds for the gridg CMux kernel.

probe13's production dissection (B=1024, js=2): full 1.372 ms/step = dots+
contrib stores ~1.05 + ladder builds 0.19 + glue 0.13 (bucket-RMW reads are
free). The builds are VPU work with no data dependency on the current cell's
MXU dots — so double-buffer the packed ladders and build cell c+1's ladders
in cell c, giving Mosaic's scheduler the freedom to overlap them with the
dots.

Mechanics: the packed [N, 2N] int32 ladders live in a [2 parity][2 ladders]
VMEM scratch; the ext input is fed twice with two BlockSpec index maps —
`cur` (this cell, used only by the c==0 prologue) and `nxt` (cell c+1's
(o, r), clamped at the end) — so all in-kernel offsets stay static (the
merged kernel showed dynamic-slice indexing defeats Mosaic).

Variants: full (probe13 baseline for drift), pipe, pipe-noglue.
Env: P14_WHICH, P14_BATCH (1024), P14_JS (2), P14_STEPS_LO/HI (64/320).
Run ALONE on the TPU.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def log(m):
    print(f"[p14 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr,
          flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.pallas import extprod

    B = int(os.environ.get("P14_BATCH", "1024"))
    j_start = int(os.environ.get("P14_JS", "2"))
    lo_steps = int(os.environ.get("P14_STEPS_LO", "64"))
    hi_steps = int(os.environ.get("P14_STEPS_HI", "320"))
    which = os.environ.get("P14_WHICH", "full,pipe,pipe-noglue").split(",")
    n_d, levels, k1, N = 2, 3, 5, 512
    base_log = 12
    R = k1 * levels
    j_cnt = 8 - j_start
    n_cells = k1 * R

    rng = np.random.default_rng(0)
    dig0 = jnp.asarray(rng.integers(-127, 128, (k1, levels, n_d, B, N),
                                    dtype=np.int8))
    ext_or = jnp.asarray(rng.integers(-127, 128, (k1, R, j_cnt, 2 * N),
                                      dtype=np.int8))
    acc0 = jnp.asarray(rng.integers(0, 1 << 32, (k1, 2, B, N),
                                    dtype=np.uint32))
    t0v = jnp.asarray(rng.integers(0, 2 * N, (B,), dtype=np.int32))

    js_all = [j for j in range(j_start, 8)
              if any(i + j < 8 for i in range(n_d))]
    lad_groups = [js_all[g: g + 4] for g in range(0, len(js_all), 4)]

    def build_ladders(ext_row_at):
        """-> list of packed [N, 2N] int32 ladders (4 planes each)."""
        lads = []
        for js in lad_groups:
            row = None
            for p_i, j in enumerate(js):
                b8 = ext_row_at(j)
                word = (b8.astype(jnp.int32) & 0xFF) << (8 * p_i)
                row = word if row is None else row | word
            lads.append(extprod._nc_rows(row, N))
        return lads

    def extract(lad_val, p_i):
        return ((lad_val[:, :N] << (24 - 8 * p_i)) >> 24).astype(jnp.int8)

    def make_pipe(do_glue):
        def kern(t_ref, dig_ref, ext_cur, ext_nxt, acc_ref,
                 out_ref, dig_out_ref, lad_ref, part_ref):
            oo = pl.program_id(1)
            r = pl.program_id(2)
            c = oo * R + r
            parity = c % 2

            @pl.when(r == 0)
            def _init():
                part_ref[...] = jnp.zeros_like(part_ref)

            @pl.when(c == 0)
            def _prologue():
                for li, lad in enumerate(build_ladders(
                        lambda j: ext_cur[0, 0, j - j_start: j - j_start + 1,
                                          :])):
                    lad_ref[0, li] = lad

            # build cell c+1's ladders into the other parity slot (skipped
            # at the last cell; ext_nxt is clamped there)
            for par in (0, 1):
                @pl.when(jnp.logical_and(parity == par, c < n_cells - 1))
                def _build(par=par):
                    for li, lad in enumerate(build_ladders(
                            lambda j: ext_nxt[0, 0, j - j_start:
                                              j - j_start + 1, :])):
                        lad_ref[1 - par, li] = lad

            # dots from this cell's prebuilt ladders
            for par in (0, 1):
                @pl.when(parity == par)
                def _dots(par=par):
                    for li, js in enumerate(lad_groups):
                        lad_val = lad_ref[par, li]
                        for p_i, j in enumerate(js):
                            ncm = extract(lad_val, p_i)
                            for i in range(n_d):
                                s = i + j
                                if s >= 8:
                                    continue
                                contrib = jnp.dot(
                                    dig_ref[0, 0, i], ncm,
                                    preferred_element_type=jnp.int32)
                                part_ref[s] = part_ref[s] + contrib

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

        def nxt_map(bb, oo, rr):
            c = oo * R + rr
            cn = jnp.minimum(c + 1, n_cells - 1)
            return (cn // R, cn % R, 0, 0)

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
                        pl.BlockSpec((1, 1, j_cnt, 2 * N), nxt_map),
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
                    scratch_shapes=[
                        pltpu.VMEM((2, len(lad_groups), N, 2 * N), jnp.int32),
                        pltpu.VMEM((8, B, N), jnp.int32)],
                    input_output_aliases={4: 0},
                )(t2, dig, ext_or, ext_or, acc)
        return step

    def make_full():
        def step(acc, dig, t):
            return extprod.extprod_step2g(
                dig, ext_or, acc, t, base_log=base_log, levels=levels,
                j_start=j_start, max_tile=B)
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
        def force(out):
            return [np.asarray(x) for x in out]

        ts = {}
        for steps in (lo_steps, hi_steps):
            fn = scan_of(mk, steps)
            force(fn(acc0, dig0, t0v))
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

    for name in which:
        if name == "full":
            slope(name, make_full())
        elif name == "pipe":
            slope(name, make_pipe(True))
        elif name == "pipe-noglue":
            slope(name, make_pipe(False))

    # correctness cross-check: pipe output must equal the production kernel
    a1, d1 = make_full()(acc0, dig0, t0v)
    a2, d2 = make_pipe(True)(acc0, dig0, t0v)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    log("pipe == full: bit-exact")
    return 0


if __name__ == "__main__":
    sys.exit(main())
