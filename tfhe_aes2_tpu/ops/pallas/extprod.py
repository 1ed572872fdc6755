"""Pallas external-product kernel: the blind-rotate CMux inner loop.

Computes, for one BSK entry, the negacyclic products

    out[b, o, m] = Σ_{r,j} digits[b, r, j] · bsk[r, o][(m - j) mod± N]

as int8 MXU matmuls against negacirculant tiles built **inside VMEM** — the
O(N²) negacirculant never touches HBM, eliminating the gather/im2col
bottlenecks of the XLA conv/gather formulations (probes/bench_probe*.py).

Index algebra: with ext = [p, -p] (length 2N, negacyclic doubling),
NC[j, m] = ext[(m - j) mod 2N] = rotate_right(ext, j)[m]. The negacirculant
rows are therefore built directly by a log-doubling chain of STATIC
rotate-rights (pure int8 slice+concat — no dynamic rotate, no digit
reversal, no sign tricks):

    M_0 = [ext];  M_{k+1} = [M_k ; rotate_right(M_k, 2^k)]  ->  rows j = 0..N-1

    out[b, m] = Σ_j d[b, j] · NC[j, m]

— a single [B, N] x [N, N] int8 matmul per (r, digit-plane, key-plane),
accumulated in int32 per limb-shift s and recombined to u64 outside.

Reference parity: this implements the per-step external product of the
CMux chain in blind rotation (reference fhe_model.rs bootstrap path);
decomposition/recombination contracts live in ops/torus.py and
ops/u32pair.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _nc_rows(ext_row, n: int):
    """ext_row [1, 2N] int8 -> [N, 2N] int8 where row j = rotate_right(ext, j)
    (= negacirculant row j). Log-doubling with static shifts: pure int8
    slice+concat, keeps everything in VMEM at native width."""
    m = ext_row
    size = 1
    while size < n:
        rolled = jnp.concatenate(
            [m[..., -size:], m[..., :-size]], axis=-1)     # rotate_right(2^k)
        m = jnp.concatenate([m, rolled], axis=0)
        size *= 2
    return m                                               # [N, 2N]


def use_nc_scratch() -> bool:
    """Build negacirculant ladders into a persistent VMEM scratch
    (TFHE_NC_SCRATCH=0 disables). The value-level doubling chain of _nc_rows
    re-materializes the ALREADY-BUILT half at every concat step (~2x the
    final matrix written through temporaries); the scratch form writes each
    row block once, with lane-aligned two-slice stores for the large steps.
    Read OUTSIDE the jitted kernels and threaded as a static arg so toggling
    retraces."""
    import os
    return os.environ.get("TFHE_NC_SCRATCH", "1") == "1"


def _nc_rows_into(buf, ext_row, n: int, slot: int | None = None):
    """_nc_rows written into a VMEM scratch ref: buf[j] = rotate_right(ext, j)
    for j in [0, N) — each doubling step stores only the NEW half (the value
    chain re-copies the old half too). Steps >= one lane tile store two
    lane-aligned column slices directly; smaller steps store a temp concat.
    buf: ref [N, 2N] (int32 for packed ladders), or [S, N, 2N] with a static
    `slot` index (the ladder-reuse kernel's per-cell slots)."""
    two_n = 2 * n

    def get(r0, r1, c0, c1):
        if slot is None:
            return buf[r0:r1, c0:c1]
        return buf[slot, r0:r1, c0:c1]

    def put(val, r0, r1, c0, c1):
        if slot is None:
            buf[r0:r1, c0:c1] = val
        else:
            buf[slot, r0:r1, c0:c1] = val

    put(ext_row, 0, 1, 0, two_n)
    size = 1
    while size < n:
        if size >= 128:
            put(get(0, size, two_n - size, two_n), size, 2 * size, 0, size)
            put(get(0, size, 0, two_n - size), size, 2 * size, size, two_n)
        else:
            src = get(0, size, 0, two_n)
            put(jnp.concatenate([src[..., -size:], src[..., :-size]],
                                axis=-1), size, 2 * size, 0, two_n)
        size *= 2


def _kernel_grid(n_d: int, n: int, dig_ref, ext_ref, out_ref):
    """Grid (O, R) body. A small per-(o, r) program keeps the Mosaic
    compile tractable (a full unroll of all rotation ladders compiled in
    minutes); the out block is revisited across r for accumulation.
    Block shapes:
    dig_ref [1, n_d, B, N]  int8  (limb planes of the raw digits, row r)
    ext_ref [1, 1, 8, 2N]   int8  ((o, r) of [O, R, 8, 2N])
    out_ref [1, 8, B, N]    int32 (output block o, revisited across r)
    """
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    for j in range(8):
        if not any(i + j < 8 for i in range(n_d)):
            continue
        ncm = _nc_rows(ext_ref[0, 0, j: j + 1, :], n)[:, :n]   # [N, N]
        for i in range(n_d):
            s = i + j
            if s >= 8:
                continue
            contrib = jnp.dot(dig_ref[0, i], ncm,
                              preferred_element_type=jnp.int32)
            out_ref[0, s] = out_ref[0, s] + contrib


@functools.partial(jax.jit, static_argnames=("interpret",))
def extprod_partials(digit_planes, ext_planes, interpret: bool | None = None):
    """digit_planes int8 [n_d, B, R, N]: limb planes of the raw (signed)
    gadget digits; ext_planes int8 [8, R, O, 2N] (see split_polys_for_pallas)
    -> int32 [8, B, O, N] partial sums (weight 2^(8s))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_d, b, r, n = digit_planes.shape
    _, r2, o, two_n = ext_planes.shape
    assert r2 == r and two_n == 2 * n

    dig_r_first = jnp.moveaxis(digit_planes, 2, 0)             # [R, n_d, B, N]
    ext_or = jnp.transpose(ext_planes, (2, 1, 0, 3))           # [O, R, 8, 2N]
    kern = functools.partial(_kernel_grid, n_d, n)
    # Mosaic rejects the i64 grid-index arithmetic that x64 mode produces;
    # all kernel dtypes are explicit, so trace the call with x64 off.
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(o, r),
            in_specs=[
                pl.BlockSpec((1, n_d, b, n), lambda oo, rr: (rr, 0, 0, 0)),
                pl.BlockSpec((1, 1, 8, two_n), lambda oo, rr: (oo, rr, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, b, n), lambda oo, rr: (oo, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((o, 8, b, n), jnp.int32),
            interpret=interpret,
        )(dig_r_first, ext_or)
    return jnp.transpose(out, (1, 2, 0, 3))                    # [8, B, O, N]


def split_polys_for_pallas(polys):
    """[R, O, N] u64 -> ext limb planes int8 [8, R, O, 2N] (ext = [p, -p])."""
    from tfhe_aes2_tpu.ops.polynomial import negacyclic_extend
    from tfhe_aes2_tpu.ops.torus import split_u64_signed

    ext = negacyclic_extend(jnp.asarray(polys, jnp.uint64))    # [R, O, 2N]
    return split_u64_signed(ext)                               # [8, R, O, 2N]


def _add_carry(lo, hi, c_lo, c_hi):
    s_lo = lo + c_lo
    carry = (s_lo < lo).astype(jnp.uint32)
    return s_lo, hi + c_hi + carry


def _kernel_grid_fused(n_d: int, n: int, r_cnt: int, j_start: int, rg: int,
                       mstack2: bool,
                       dig_ref, ext_ref, acc_ref, out_ref, part_ref,
                       nc_ref=None):
    """Grid (BT, O, R) body with u64 recombination + CMux accumulate fused in.

    Per-(bt, o, r) partial sums accumulate in VMEM scratch; at the last r the
    8 shift buckets are combined into a (lo, hi) u32 pair and added to the
    accumulator — the int32 partials never touch HBM (the unfused path wrote
    8·[B, O, N] int32 per step, dominating step time at production shapes).
    The batch-tile grid axis keeps the scratch within the scoped-VMEM limit
    at large batches.
    Block shapes (B = one batch tile):
    dig_ref  [1, n_d, B, N]  int8   (limb planes of the digits, row r)
    ext_ref  [1, 1, 8-j_start, 2N] int8 ((o, r) of [O, R, 8-j_start, 2N])
    acc_ref  [1, 2, B, N]    uint32 (accumulator (lo, hi) pair, component o)
    out_ref  [1, 2, B, N]    uint32 (new accumulator pair, component o)
    part_ref [8, B, N]       int32  scratch (persists across the grid)

    j_start > 0 drops the lowest BSK limb planes: their products land fully
    below the blind-rotate noise floor (caller validates against the BSK
    noise std), saving 2/15 of the MXU work at j_start=1.
    """
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _init():
        part_ref[...] = jnp.zeros_like(part_ref)

    bt = part_ref.shape[1]
    for rr in range(rg):
        _packed_dots(n_d, n, j_start,
                     lambda i, rr=rr: dig_ref[rr, i],
                     lambda jo, rr=rr: ext_ref[0, rr, jo: jo + 1, :],
                     part_ref,
                     dig_all=lambda rr=rr: dig_ref[rr].reshape(n_d * bt, n),
                     mstack2=mstack2, nc_ref=nc_ref)

    @pl.when(r == r_cnt // rg - 1)
    def _fini():
        lo, hi = _recombine(j_start, acc_ref[0, 0], acc_ref[0, 1], part_ref)
        out_ref[0, 0] = lo
        out_ref[0, 1] = hi


def use_mstack2() -> bool:
    """Fused-RMW M-stacked dots (TFHE_BR_MSTACK2=1): per BSK plane j one
    [n_d·B, N] x [N, N] dot whose i-major result rows land on the ADJACENT
    buckets s = j..j+n_d-1, updated with ONE sliced read-modify-write
    part[j:j+n_d] += c. probe10's "mstack" (separate per-slice RMWs of the
    stacked result) measured slower than per-plane dots; this variant
    removes the result slicing entirely. Read OUTSIDE the jitted kernels and
    threaded through as a static arg so toggling it retraces."""
    import os
    return os.environ.get("TFHE_BR_MSTACK2", "0") == "1"


def _packed_dots(n_d: int, n: int, j_start: int, dig_at, ext_at, part_ref,
                 dig_all=None, mstack2: bool = False, nc_ref=None):
    """The CMux dot core: negacirculants for 4 limb planes per rotation
    ladder — the planes of one (o, r) BSK polynomial share the rotation
    structure, so packing 4 int8 planes into int32 lanes runs one ladder
    where the naive form runs four (VPU lane width is 32 bits; measured
    -11%/step at production shapes, probes/bench_probe9.py "packed"). Extracted
    plane VALUES feed the dots directly — unpacking into an int8 scratch
    costs more than it saves.

    dig_all (optional): () -> the [n_d·B, N] i-major merged digit view,
    enabling the fused-RMW stacked dots when mstack2 is set (use_mstack2)."""
    mstack2 = dig_all is not None and n_d > 1 and mstack2
    bt = part_ref.shape[1]
    for j, ncm in _packed_nc_planes(
            n, [j for j in range(j_start, 8)
                if any(i + j < 8 for i in range(n_d))],
            lambda j: ext_at(j - j_start), nc_ref=nc_ref):
        if mstack2 and j + n_d - 1 < 8:
            c = jnp.dot(dig_all(), ncm, preferred_element_type=jnp.int32)
            part_ref[j: j + n_d] = (part_ref[j: j + n_d]
                                    + c.reshape(n_d, bt, n))
            continue
        for i in range(n_d):
            s = i + j
            if s >= 8:
                continue
            contrib = jnp.dot(dig_at(i), ncm,
                              preferred_element_type=jnp.int32)
            part_ref[s] = part_ref[s] + contrib


def _packed_nc_planes(n: int, js_all, ext_row_at, nc_ref=None):
    """Yield (j, negacirculant[N, N] int8) for each plane j in js_all, built
    4 planes per int32 rotation ladder (see _packed_dots docstring).
    With nc_ref (VMEM scratch [N, 2N] int32, or [S, N, 2N] — consecutive
    ladders ALTERNATE slots so the next build need not wait for the previous
    ladder's consumers) the ladder is built in place — each row block stored
    once instead of the value chain's ~2x rewrite."""
    for gi, g in enumerate(range(0, len(js_all), 4)):
        js = js_all[g: g + 4]
        row = None
        for p_i, j in enumerate(js):
            b8 = ext_row_at(j)
            word = (b8.astype(jnp.int32) & 0xFF) << (8 * p_i)
            row = word if row is None else row | word
        if nc_ref is not None:
            slot = None if nc_ref.ndim == 2 else gi % nc_ref.shape[0]
            _nc_rows_into(nc_ref, row, n, slot=slot)
            packed = (nc_ref[:, :n] if slot is None
                      else nc_ref[slot, :, :n])                # [N, N] int32
        else:
            packed = _nc_rows(row, n)[:, :n]                   # [N, N] int32
        for p_i, j in enumerate(js):
            yield j, ((packed << (24 - 8 * p_i)) >> 24).astype(jnp.int8)


def _recombine(j_start: int, lo, hi, part_ref):
    """Fold the 8 weight-2^(8s) int32 buckets into the (lo, hi) u32 pair."""
    for s in range(j_start, 8):
        val = part_ref[s]
        v_lo = val.astype(jnp.uint32)
        v_hi = (val >> 31).astype(jnp.uint32)       # arithmetic sign bits
        sh = 8 * s
        if sh == 0:
            c_lo, c_hi = v_lo, v_hi
        elif sh < 32:
            c_lo = v_lo << jnp.uint32(sh)
            c_hi = (v_hi << jnp.uint32(sh)) | (v_lo >> jnp.uint32(32 - sh))
        else:
            c_lo = jnp.zeros_like(v_lo)
            c_hi = v_lo << jnp.uint32(sh - 32)
        lo, hi = _add_carry(lo, hi, c_lo, c_hi)
    return lo, hi


@functools.partial(jax.jit, static_argnames=("interpret", "j_start",
                                              "max_tile", "mstack2"))
def extprod_step(digit_planes, ext_planes, acc_lo, acc_hi,
                 interpret: bool | None = None, j_start: int = 0,
                 max_tile: int = 256, mstack2: bool = False):
    """One fused CMux update: acc + Σ_r digits_r ⊛ bsk_row_r, on u32 pairs.

    digit_planes int8 [n_d, B, R, N]; ext_planes int8 [8-j_start, R, O, 2N]
    (lowest j_start BSK limb planes pre-dropped by the caller, who must check
    the truncation error sits below the BSK noise floor);
    acc_lo/acc_hi uint32 [B, O, N] -> (new_lo, new_hi) uint32 [B, O, N].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_d, b, r, n = digit_planes.shape
    j_cnt, r2, o, two_n = ext_planes.shape
    assert r2 == r and two_n == 2 * n and j_cnt == 8 - j_start

    from jax.experimental.pallas import tpu as pltpu

    # Batch tile: scratch + double-buffered in/out blocks must stay within
    # the ~16MB scoped-VMEM limit (bt=512 measured 17MB at N=512; bt=256
    # halves every batch-extent buffer).
    bt = b
    while bt > max_tile:
        assert bt % 2 == 0, f"batch {b} not tileable to <={max_tile}"
        bt //= 2
    n_bt = b // bt

    dig_r_first = jnp.moveaxis(digit_planes, 2, 0)             # [R, n_d, B, N]
    ext_or = jnp.transpose(ext_planes, (2, 1, 0, 3))           # [O, R, 8, 2N]
    acc = jnp.stack([jnp.moveaxis(acc_lo, -2, 0),
                     jnp.moveaxis(acc_hi, -2, 0)], axis=1)     # [O, 2, B, N]
    kern = functools.partial(_kernel_grid_fused, n_d, n, r, j_start, 1,
                             mstack2)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_bt, o, r),
            in_specs=[
                pl.BlockSpec((1, n_d, bt, n), lambda bb, oo, rr: (rr, 0, bb, 0)),
                pl.BlockSpec((1, 1, 8 - j_start, two_n),
                             lambda bb, oo, rr: (oo, rr, 0, 0)),
                pl.BlockSpec((1, 2, bt, n), lambda bb, oo, rr: (oo, 0, bb, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, bt, n),
                                   lambda bb, oo, rr: (oo, 0, bb, 0)),
            out_shape=jax.ShapeDtypeStruct((o, 2, b, n), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((8, bt, n), jnp.int32)],
            interpret=interpret,
        )(dig_r_first, ext_or, acc)
    new_lo = jnp.moveaxis(out[:, 0], 0, -2)                    # [B, O, N]
    new_hi = jnp.moveaxis(out[:, 1], 0, -2)
    return new_lo, new_hi


def _rot_diff_digits_kernel(n: int, base_log: int, levels: int, n_d: int,
                            t_ref, acc_ref, out_ref):
    """Grid (BT, U) body: X^t·acc - acc, gadget-decomposed and split to int8
    limb planes, entirely in VMEM.

    The XLA formulation of this glue (binary rotation ladder + u32-pair
    decompose + plane split between two pallas calls) round-trips the
    accumulator and digit tensors through HBM several times per CMux step;
    here the only HBM traffic is one read of the accumulator component and
    one write of the int8 planes.

    Block shapes (B = one batch tile):
    t_ref   [B, 1]            int32  (mod-switched mask element, in [0, 2N))
    acc_ref [1, 2, B, N]      uint32 (accumulator (lo, hi), component u)
    out_ref [1, L, n_d, B, N] int8   (digit limb planes of rows (u, l))
    """
    def write_plane(l, i, p):
        out_ref[0, l, i] = p

    _glue_body(n, base_log, levels, n_d, acc_ref[0, 0], acc_ref[0, 1],
               t_ref[...], write_plane)


@functools.partial(jax.jit, static_argnames=("base_log", "levels", "n_d",
                                              "interpret", "max_tile"))
def rot_diff_digits(acc, t, base_log: int, levels: int, n_d: int,
                    interpret: bool | None = None,
                    max_tile: int | None = None):
    """Fused CMux-step glue: digit limb planes of X^t·acc - acc.

    acc: uint32 [k+1, 2, B, N] (component-major (lo, hi) accumulator —
         the layout extprod_step2 carries through the blind-rotate scan).
    t:   int32 [B] in [0, 2N).
    Returns int8 [R=(k+1)·levels, n_d, B, N], row r = u·levels + l — exactly
    the dig_r_first layout extprod_step2 consumes.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if max_tile is None:
        max_tile = _default_tile()
    k1, two, b, n = acc.shape
    assert two == 2
    bt = b
    while bt > max_tile:
        assert bt % 2 == 0, f"batch {b} not tileable to <={max_tile}"
        bt //= 2
    n_bt = b // bt

    t2 = t.reshape(b, 1).astype(jnp.int32)
    kern = functools.partial(_rot_diff_digits_kernel, n, base_log, levels, n_d)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_bt, k1),
            in_specs=[
                pl.BlockSpec((bt, 1), lambda bb, uu: (bb, 0)),
                pl.BlockSpec((1, 2, bt, n), lambda bb, uu: (uu, 0, bb, 0)),
            ],
            out_specs=pl.BlockSpec((1, levels, n_d, bt, n),
                                   lambda bb, uu: (uu, 0, 0, bb, 0)),
            out_shape=jax.ShapeDtypeStruct((k1, levels, n_d, b, n), jnp.int8),
            interpret=interpret,
        )(t2, acc)
    return out.reshape(k1 * levels, n_d, b, n)


def _default_tile() -> int:
    """Batch tile for the fused blind-rotate kernels. Larger tiles amortize
    the per-(o, r) in-VMEM negacirculant builds (measured dominant at small
    tiles); the ceiling is the scoped-VMEM limit, raised to 64MB at package
    import. Override with TFHE_BT."""
    import os
    return int(os.environ.get("TFHE_BT", "1024"))


@functools.partial(jax.jit, static_argnames=("interpret", "j_start",
                                              "max_tile", "mstack2",
                                              "nc_scratch"))
def extprod_step2(dig_r_first, ext_or, acc,
                  interpret: bool | None = None, j_start: int = 0,
                  max_tile: int | None = None, mstack2: bool = False,
                  nc_scratch: bool = False):
    """extprod_step on pre-transposed layouts: the whole-scan carry stays in
    the kernel-native [O, 2, B, N] accumulator layout, so a CMux step is
    exactly two pallas calls (rot_diff_digits + this) with no XLA glue.
    The acc input is aliased with the output (no extra HBM buffer or copy).

    dig_r_first: int8 [R, n_d, B, N]; ext_or: int8 [O, R, 8-j_start, 2N];
    acc: uint32 [O, 2, B, N] -> new acc uint32 [O, 2, B, N].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if max_tile is None:
        max_tile = _default_tile()
    r, n_d, b, n = dig_r_first.shape
    o, r2, j_cnt, two_n = ext_or.shape
    assert r2 == r and two_n == 2 * n and j_cnt == 8 - j_start

    from jax.experimental.pallas import tpu as pltpu

    bt = b
    while bt > max_tile:
        assert bt % 2 == 0, f"batch {b} not tileable to <={max_tile}"
        bt //= 2
    n_bt = b // bt

    # row-grouped cells: processing TFHE_BR_RG decomposition rows per grid
    # cell shaved per-cell overhead in isolation at bt=512 (probe11:
    # 0.767 -> 0.738 ms/step at rg=3) but REGRESSED the full bench at
    # bt=1024 (0.600 -> 0.520 blocks/s) — default 1
    import os as _os
    rg = int(_os.environ.get("TFHE_BR_RG", "1"))
    if rg < 1 or r % rg != 0:
        rg = 1
    kern = functools.partial(_kernel_grid_fused, n_d, n, r, j_start, rg,
                             mstack2)
    scratch = [pltpu.VMEM((8, bt, n), jnp.int32)]
    if nc_scratch:
        scratch.append(pltpu.VMEM((n, two_n), jnp.int32))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_bt, o, r // rg),
            in_specs=[
                pl.BlockSpec((rg, n_d, bt, n),
                             lambda bb, oo, rc: (rc, 0, bb, 0)),
                pl.BlockSpec((1, rg, 8 - j_start, two_n),
                             lambda bb, oo, rc: (oo, rc, 0, 0)),
                pl.BlockSpec((1, 2, bt, n), lambda bb, oo, rc: (oo, 0, bb, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, bt, n),
                                   lambda bb, oo, rc: (oo, 0, bb, 0)),
            out_shape=jax.ShapeDtypeStruct((o, 2, b, n), jnp.uint32),
            scratch_shapes=scratch,
            input_output_aliases={2: 0},
            interpret=interpret,
        )(dig_r_first, ext_or, acc)
    return out


def _kernel_grid_fused_g(n_d: int, n: int, r_cnt: int, j_start: int,
                         base_log: int, levels: int, mstack2: bool,
                         t_ref, dig_ref, ext_ref, acc_ref,
                         out_ref, dig_out_ref, part_ref, nc_ref=None):
    """_kernel_grid_fused with next-step glue fused into the finish: at
    r == R-1 the cell holds the NEW accumulator component o in VMEM, which is
    exactly the input of the next step's rotation/diff/decompose for rows
    u = o — so the glue runs here instead of as its own pallas call (saving
    one kernel launch and a 10.5MB accumulator re-read per CMux step).

    Extra block shapes (on top of _kernel_grid_fused's):
    t_ref       [B, 1]                int32 (NEXT step's mod-switched mask)
    dig_out_ref [1, levels, n_d, B, N] int8 (next digits, rows (u=o, l))
    """
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _init():
        part_ref[...] = jnp.zeros_like(part_ref)

    _packed_dots(n_d, n, j_start, lambda i: dig_ref[0, 0, i],
                 lambda jo: ext_ref[0, 0, jo: jo + 1, :], part_ref,
                 dig_all=lambda: dig_ref[0, 0].reshape(
                     n_d * part_ref.shape[1], n),
                 mstack2=mstack2, nc_ref=nc_ref)

    @pl.when(r == r_cnt - 1)
    def _fini():
        lo, hi = _recombine(j_start, acc_ref[0, 0], acc_ref[0, 1], part_ref)
        out_ref[0, 0] = lo
        out_ref[0, 1] = hi

        def write_plane(l, i, p):
            dig_out_ref[0, l, i] = p

        _glue_body(n, base_log, levels, n_d, lo, hi, t_ref[...], write_plane)


@functools.partial(jax.jit, static_argnames=(
    "base_log", "levels", "interpret", "j_start", "max_tile", "mstack2",
    "nc_scratch"))
def extprod_step2g(dig, ext_or, acc, t_next, base_log: int, levels: int,
                   interpret: bool | None = None, j_start: int = 0,
                   max_tile: int | None = None, mstack2: bool = False,
                   nc_scratch: bool = False):
    """One CMux step in ONE pallas call: extprod_step2 dots/recombine plus
    the NEXT step's rotation/diff/decompose glue fused into the finish.

    dig:    int8 [k1, levels, n_d, B, N] (this step's digits, rows (u, l));
    ext_or: int8 [O, R, 8-j_start, 2N];
    acc:    uint32 [O, 2, B, N] (aliased with the acc output);
    t_next: int32 [B] (next step's mod-switched mask element, in [0, 2N)).
    Returns (new_acc [O, 2, B, N] u32, next_dig [k1, levels, n_d, B, N] i8).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if max_tile is None:
        max_tile = _default_tile()
    k1, levels2, n_d, b, n = dig.shape
    o, r, j_cnt, two_n = ext_or.shape
    assert levels2 == levels and r == k1 * levels and o == k1
    assert two_n == 2 * n and j_cnt == 8 - j_start

    from jax.experimental.pallas import tpu as pltpu

    bt = b
    while bt > max_tile:
        assert bt % 2 == 0, f"batch {b} not tileable to <={max_tile}"
        bt //= 2
    n_bt = b // bt

    t2 = t_next.reshape(b, 1).astype(jnp.int32)

    kern = functools.partial(_kernel_grid_fused_g, n_d, n, r, j_start,
                             base_log, levels, mstack2)
    scratch = [pltpu.VMEM((8, bt, n), jnp.int32)]
    if nc_scratch:
        scratch.append(pltpu.VMEM((n, two_n), jnp.int32))
    with jax.enable_x64(False):
        new_acc, new_dig = pl.pallas_call(
            kern,
            grid=(n_bt, o, r),
            in_specs=[
                pl.BlockSpec((bt, 1), lambda bb, oo, rr: (bb, 0)),
                pl.BlockSpec((1, 1, n_d, bt, n),
                             lambda bb, oo, rr: (rr // levels, rr % levels,
                                                 0, bb, 0)),
                pl.BlockSpec((1, 1, 8 - j_start, two_n),
                             lambda bb, oo, rr: (oo, rr, 0, 0)),
                pl.BlockSpec((1, 2, bt, n), lambda bb, oo, rr: (oo, 0, bb, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 2, bt, n), lambda bb, oo, rr: (oo, 0, bb, 0)),
                pl.BlockSpec((1, levels, n_d, bt, n),
                             lambda bb, oo, rr: (oo, 0, 0, bb, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((o, 2, b, n), jnp.uint32),
                jax.ShapeDtypeStruct((k1, levels, n_d, b, n), jnp.int8),
            ],
            scratch_shapes=scratch,
            input_output_aliases={3: 0},
            interpret=interpret,
        )(t2, dig, ext_or, acc)
    return new_acc, new_dig


def _glue_body(n: int, base_log: int, levels: int, n_d: int,
               lo0, hi0, t, write_plane):
    """Rotation ladder + diff + decompose + int8 split for one accumulator
    component; emits each digit limb plane via write_plane(l, i, plane).
    Shared by the merged CMux kernel and rot_diff_digits."""
    lo, hi = lo0, hi0
    for k in range((2 * n).bit_length() - 1):
        shift = 1 << k
        if shift == n:
            r_lo = jnp.uint32(0) - lo
            borrow = (lo != 0).astype(jnp.uint32)
            r_hi = jnp.uint32(0) - hi - borrow
        else:
            t_lo = jnp.uint32(0) - lo[..., n - shift:]
            t_borrow = (lo[..., n - shift:] != 0).astype(jnp.uint32)
            t_hi = jnp.uint32(0) - hi[..., n - shift:] - t_borrow
            r_lo = jnp.concatenate([t_lo, lo[..., : n - shift]], axis=-1)
            r_hi = jnp.concatenate([t_hi, hi[..., : n - shift]], axis=-1)
        take = ((t >> k) & 1) == 1
        lo = jnp.where(take, r_lo, lo)
        hi = jnp.where(take, r_hi, hi)

    d_lo = lo - lo0
    borrow = (lo < lo0).astype(jnp.uint32)
    d_hi = hi - hi0 - borrow

    b = base_log
    total = b * levels
    shift = 64 - total
    if shift > 0:
        if shift - 1 < 32:
            rlo = d_lo + (jnp.uint32(1) << jnp.uint32(shift - 1))
            carry = (rlo < d_lo).astype(jnp.uint32)
            rhi = d_hi + carry
        else:
            rlo = d_lo
            rhi = d_hi + (jnp.uint32(1) << jnp.uint32(shift - 1 - 32))
    else:
        rlo, rhi = d_lo, d_hi
    if shift == 0:
        r_lo, r_hi = rlo, rhi
    elif shift < 32:
        r_lo = (rlo >> jnp.uint32(shift)) | (rhi << jnp.uint32(32 - shift))
        r_hi = rhi >> jnp.uint32(shift)
    else:
        r_lo = rhi >> jnp.uint32(shift - 32) if shift > 32 else rhi
        r_hi = jnp.zeros_like(rhi)
    h = sum(1 << (b - 1 + b * l) for l in range(levels))
    y_lo = r_lo + jnp.uint32(h & 0xFFFFFFFF)
    carry = (y_lo < r_lo).astype(jnp.uint32)
    y_hi = r_hi + jnp.uint32((h >> 32) & 0xFFFFFFFF) + carry

    half = 1 << (b - 1)
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    off = jnp.int32(sum(128 << (8 * i) for i in range(n_d - 1)))
    for l in range(levels):
        pos = b * (levels - 1 - l)
        if pos >= 32:
            field = (y_hi >> jnp.uint32(pos - 32)) & mask
        elif pos + b <= 32:
            field = (y_lo >> jnp.uint32(pos)) & mask
        else:
            field = ((y_lo >> jnp.uint32(pos)) |
                     (y_hi << jnp.uint32(32 - pos))) & mask
        digit = field.astype(jnp.int32) - half
        y = digit + off
        for i in range(n_d):
            if i < n_d - 1:
                p = ((y >> (8 * i)) & 0xFF) - 128
            else:
                p = y >> (8 * i)
            write_plane(l, i, p.astype(jnp.int8))


def _kernel_merged(n_d: int, n: int, k1: int, levels: int, base_log: int,
                   r_cnt: int, j_start: int,
                   t_ref, ext_ref, acc_ref, out_ref, dig_ref, part_ref):
    """Grid (BT, O, R) body: the COMPLETE CMux step in one kernel — glue
    (rotation/diff/decompose/split, run once per component on the oo==0
    pass, digits kept in VMEM scratch) + negacirculant dots + u64
    recombination/accumulate. One pallas launch per blind-rotate step; the
    digit planes never touch HBM.

    Block shapes (B = one batch tile):
    t_ref    [B, 1]                int32  (mod-switched mask element)
    ext_ref  [1, 1, 8-j_start, 2N] int8   ((o, r) of [O, R, ., 2N])
    acc_ref  [k1, 2, B, N]         uint32 (FULL accumulator, batch tile bb)
    out_ref  [k1, 2, B, N]         uint32 (aliased with acc)
    dig_ref  [R, n_d, B, N]        int8   scratch (current tile's digits)
    part_ref [8, B, N]             int32  scratch
    """
    oo = pl.program_id(1)
    r = pl.program_id(2)

    for u in range(k1):
        @pl.when(jnp.logical_and(oo == 0, r == u * levels))
        def _glue(u=u):
            def write_plane(l, i, p):
                dig_ref[u * levels + l, i] = p
            _glue_body(n, base_log, levels, n_d,
                       acc_ref[u, 0], acc_ref[u, 1], t_ref[...], write_plane)

    @pl.when(r == 0)
    def _init():
        part_ref[...] = jnp.zeros_like(part_ref)

    for j in range(j_start, 8):
        if not any(i + j < 8 for i in range(n_d)):
            continue
        ncm = _nc_rows(ext_ref[0, 0, j - j_start: j - j_start + 1, :],
                       n)[:, :n]
        for i in range(n_d):
            s = i + j
            if s >= 8:
                continue
            contrib = jnp.dot(dig_ref[r, i], ncm,
                              preferred_element_type=jnp.int32)
            part_ref[s] = part_ref[s] + contrib

    @pl.when(r == r_cnt - 1)
    def _fini():
        lo, hi = _recombine(j_start, acc_ref[oo, 0], acc_ref[oo, 1], part_ref)
        out_ref[oo, 0] = lo
        out_ref[oo, 1] = hi


@functools.partial(jax.jit, static_argnames=("base_log", "levels",
                                              "interpret", "j_start",
                                              "max_tile"))
def cmux_step_merged(t, ext_or, acc, base_log: int, levels: int,
                     interpret: bool | None = None, j_start: int = 0,
                     max_tile: int = 512):
    """One COMPLETE blind-rotate CMux step as a single pallas call.

    t: int32 [B] in [0, 2N); ext_or: int8 [O, R, 8-j_start, 2N];
    acc: uint32 [O(k1), 2, B, N] -> new acc uint32 [O, 2, B, N].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    o, two, b, n = acc.shape
    o2, r, j_cnt, two_n = ext_or.shape
    assert o2 == o and two == 2 and two_n == 2 * n and j_cnt == 8 - j_start
    assert r == o * levels

    from tfhe_aes2_tpu.ops.torus import limbs_for_bound
    n_d = limbs_for_bound(1 << (base_log - 1))

    from jax.experimental.pallas import tpu as pltpu

    bt = b
    while bt > max_tile:
        assert bt % 2 == 0, f"batch {b} not tileable to <={max_tile}"
        bt //= 2
    n_bt = b // bt

    t2 = t.reshape(b, 1).astype(jnp.int32)
    kern = functools.partial(_kernel_merged, n_d, n, o, levels, base_log,
                             r, j_start)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_bt, o, r),
            in_specs=[
                pl.BlockSpec((bt, 1), lambda bb, oo, rr: (bb, 0)),
                pl.BlockSpec((1, 1, 8 - j_start, two_n),
                             lambda bb, oo, rr: (oo, rr, 0, 0)),
                pl.BlockSpec((o, 2, bt, n), lambda bb, oo, rr: (0, 0, bb, 0)),
            ],
            out_specs=pl.BlockSpec((o, 2, bt, n),
                                   lambda bb, oo, rr: (0, 0, bb, 0)),
            out_shape=jax.ShapeDtypeStruct((o, 2, b, n), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((r, n_d, bt, n), jnp.int8),
                            pltpu.VMEM((8, bt, n), jnp.int32)],
            input_output_aliases={2: 0},
            interpret=interpret,
        )(t2, ext_or, acc)
    return out


def _rot_diff_digits_flat_kernel(n: int, base_log: int, levels: int,
                                 n_d: int, t_ref, acc_ref, out_ref):
    """Grid (BT, U) body: like _rot_diff_digits_kernel but emitting the
    row-flattened digit layout [n_d, B, R·N] (column r·N + c, r = u·L + l)
    that the long-K CMux kernel consumes as a single matmul operand.

    Block shapes (B = one batch tile):
    t_ref   [B, 1]               int32
    acc_ref [1, 2, B, N]         uint32 (accumulator (lo, hi), component u)
    out_ref [n_d, B, levels·N]   int8   (columns u·levels·N .. of [n_d, B, R·N])
    """
    def write_plane(l, i, p):
        out_ref[i, :, l * n: (l + 1) * n] = p

    _glue_body(n, base_log, levels, n_d, acc_ref[0, 0], acc_ref[0, 1],
               t_ref[...], write_plane)


@functools.partial(jax.jit, static_argnames=("base_log", "levels", "n_d",
                                              "interpret", "max_tile"))
def rot_diff_digits_flat(acc, t, base_log: int, levels: int, n_d: int,
                         interpret: bool | None = None,
                         max_tile: int | None = None):
    """rot_diff_digits emitting int8 [n_d, B, R·N] (row-major (r, coeff)
    columns) — the LHS layout of extprod_step_longk."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if max_tile is None:
        max_tile = _default_tile()
    k1, two, b, n = acc.shape
    assert two == 2
    bt = b
    while bt > max_tile:
        assert bt % 2 == 0, f"batch {b} not tileable to <={max_tile}"
        bt //= 2
    n_bt = b // bt

    t2 = t.reshape(b, 1).astype(jnp.int32)
    kern = functools.partial(_rot_diff_digits_flat_kernel, n, base_log,
                             levels, n_d)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_bt, k1),
            in_specs=[
                pl.BlockSpec((bt, 1), lambda bb, uu: (bb, 0)),
                pl.BlockSpec((1, 2, bt, n), lambda bb, uu: (uu, 0, bb, 0)),
            ],
            out_specs=pl.BlockSpec((n_d, bt, levels * n),
                                   lambda bb, uu: (0, bb, uu)),
            out_shape=jax.ShapeDtypeStruct((n_d, b, k1 * levels * n),
                                           jnp.int8),
            interpret=interpret,
        )(t2, acc)
    return out


def _kernel_longk(n_d: int, n: int, r_cnt: int, j_start: int,
                  dig_ref, ext_ref, acc_ref, out_ref, nc_ref, part_ref):
    """Grid (BT, O, J) body: per (o, BSK-limb-plane j) ONE long-K matmul per
    digit limb — the R negacirculants of plane j stack into a [R·N, N]
    block-diagonal-free contraction, so the int32 bucket scratch is written
    at most twice per bucket instead of once per (r, i, j) term (the per-(o,r)
    kernel's 13 read-modify-writes per cell ≈ 2 GB/step of VMEM traffic at
    production shapes, on par with the MXU dot time itself).

    Block shapes (B = one batch tile):
    dig_ref  [n_d, B, R·N]   int8   (flat digit planes, same block ∀ cells)
    ext_ref  [1, 1, R, 2N]   int8   ((o, j) of [O, J, R, 2N])
    acc_ref  [1, 2, B, N]    uint32 (accumulator (lo, hi), component o)
    out_ref  [1, 2, B, N]    uint32 (aliased with acc)
    nc_ref   [R·N, N]        int8   scratch (plane j's stacked negacirculants)
    part_ref [8, B, N]       int32  scratch (weight-2^(8s) buckets)
    """
    jj = pl.program_id(2)
    j_cnt = 8 - j_start

    for r in range(r_cnt):
        nc_ref[r * n: (r + 1) * n, :] = _nc_rows(
            ext_ref[0, 0, r: r + 1, :], n)[:, :n]

    for j_val in range(j_start, 8):
        @pl.when(jj == j_val - j_start)
        def _dots(j_val=j_val):
            for i in range(n_d):
                s = j_val + i
                if s >= 8:
                    continue
                c = jnp.dot(dig_ref[i], nc_ref[...],
                            preferred_element_type=jnp.int32)
                # first writer of bucket s is the cell with the largest i
                if j_val == max(j_start, s - n_d + 1):
                    part_ref[s] = c
                else:
                    part_ref[s] = part_ref[s] + c

    @pl.when(jj == j_cnt - 1)
    def _fini():
        lo, hi = _recombine(j_start, acc_ref[0, 0], acc_ref[0, 1], part_ref)
        out_ref[0, 0] = lo
        out_ref[0, 1] = hi


@functools.partial(jax.jit, static_argnames=("interpret", "j_start",
                                              "max_tile"))
def extprod_step_longk(dig_flat, ext_oj, acc,
                       interpret: bool | None = None, j_start: int = 0,
                       max_tile: int | None = None):
    """extprod_step2 with long-K bucket dots (see _kernel_longk).

    dig_flat: int8 [n_d, B, R·N] (rot_diff_digits_flat layout);
    ext_oj:   int8 [O, 8-j_start, R, 2N];
    acc:      uint32 [O, 2, B, N] -> new acc uint32 [O, 2, B, N] (aliased).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if max_tile is None:
        max_tile = _default_tile()
    n_d, b, rn = dig_flat.shape
    o, j_cnt, r, two_n = ext_oj.shape
    n = two_n // 2
    assert rn == r * n and j_cnt == 8 - j_start

    from jax.experimental.pallas import tpu as pltpu

    bt = b
    while bt > max_tile:
        assert bt % 2 == 0, f"batch {b} not tileable to <={max_tile}"
        bt //= 2
    n_bt = b // bt

    kern = functools.partial(_kernel_longk, n_d, n, r, j_start)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_bt, o, j_cnt),
            in_specs=[
                pl.BlockSpec((n_d, bt, rn), lambda bb, oo, jj: (0, bb, 0)),
                pl.BlockSpec((1, 1, r, two_n),
                             lambda bb, oo, jj: (oo, jj, 0, 0)),
                pl.BlockSpec((1, 2, bt, n), lambda bb, oo, jj: (oo, 0, bb, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, bt, n),
                                   lambda bb, oo, jj: (oo, 0, bb, 0)),
            out_shape=jax.ShapeDtypeStruct((o, 2, b, n), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((r * n, n), jnp.int8),
                            pltpu.VMEM((8, bt, n), jnp.int32)],
            input_output_aliases={2: 0},
            interpret=interpret,
        )(dig_flat, ext_oj, acc)
    return out


def _kernel_bucket(n_d: int, n: int, r_cnt: int, j_start: int,
                   dig_ref, ext_ref, acc_ref, out_ref, part_ref):
    """Grid (BT, O, S) body: one limb-weight bucket per cell, computed as a
    single same-target chain of dots over all R rows (and both digit limbs),
    so the MXU accumulates the whole bucket without scratch read-modify-write
    round trips (the per-(o, r) kernel's 13 scattered bucket updates per cell
    measured ~40% of step time).

    Cell (bb, oo, ss) computes bucket s = j_start + ss:
        part[s] = Σ_r Σ_i dot(dig[r, i], NC(ext[o, r, j=s-i]))
    (terms with j outside [j_start, 7] drop). At the last s the buckets are
    recombined into the (lo, hi) accumulator.

    Block shapes (B = one batch tile):
    dig_ref  [R, n_d, B, N]  int8   (all rows' digit limb planes)
    ext_ref  [1, R, 8-j_start, 2N] int8 (component o of [O, R, ., 2N])
    acc_ref  [1, 2, B, N]    uint32 (accumulator (lo, hi), component o)
    out_ref  [1, 2, B, N]    uint32
    part_ref [8, B, N]       int32  (bucket values, written once each)
    """
    ss = pl.program_id(2)
    s_cnt = 8 - j_start

    for s_val in range(j_start, 8):
        @pl.when(ss == s_val - j_start)
        def _bucket(s=s_val):
            contrib = None
            for r in range(r_cnt):
                for i in range(n_d):
                    j = s - i
                    if j < j_start or j > 7:
                        continue
                    ncm = _nc_rows(ext_ref[0, r, j - j_start: j - j_start + 1,
                                           :], n)[:, :n]
                    term = jnp.dot(dig_ref[r, i], ncm,
                                   preferred_element_type=jnp.int32)
                    contrib = term if contrib is None else contrib + term
            part_ref[s] = contrib

    @pl.when(ss == s_cnt - 1)
    def _fini():
        lo, hi = _recombine(j_start, acc_ref[0, 0], acc_ref[0, 1], part_ref)
        out_ref[0, 0] = lo
        out_ref[0, 1] = hi


@functools.partial(jax.jit, static_argnames=("interpret", "j_start",
                                              "max_tile"))
def extprod_step3(dig_r_first, ext_or, acc,
                  interpret: bool | None = None, j_start: int = 0,
                  max_tile: int = 512):
    """extprod_step2 with bucket-major dot chains (see _kernel_bucket).

    dig_r_first: int8 [R, n_d, B, N]; ext_or: int8 [O, R, 8-j_start, 2N];
    acc: uint32 [O, 2, B, N] -> new acc uint32 [O, 2, B, N].
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    r, n_d, b, n = dig_r_first.shape
    o, r2, j_cnt, two_n = ext_or.shape
    assert r2 == r and two_n == 2 * n and j_cnt == 8 - j_start

    from jax.experimental.pallas import tpu as pltpu

    bt = b
    while bt > max_tile:
        assert bt % 2 == 0, f"batch {b} not tileable to <={max_tile}"
        bt //= 2
    n_bt = b // bt

    kern = functools.partial(_kernel_bucket, n_d, n, r, j_start)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n_bt, o, 8 - j_start),
            in_specs=[
                pl.BlockSpec((r, n_d, bt, n), lambda bb, oo, ss: (0, 0, bb, 0)),
                pl.BlockSpec((1, r, 8 - j_start, two_n),
                             lambda bb, oo, ss: (oo, 0, 0, 0)),
                pl.BlockSpec((1, 2, bt, n), lambda bb, oo, ss: (oo, 0, bb, 0)),
            ],
            out_specs=pl.BlockSpec((1, 2, bt, n),
                                   lambda bb, oo, ss: (oo, 0, bb, 0)),
            out_shape=jax.ShapeDtypeStruct((o, 2, b, n), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((8, bt, n), jnp.int32)],
            input_output_aliases={2: 0},
            interpret=interpret,
        )(dig_r_first, ext_or, acc)
    return out


def _kernel_grouped(n_d: int, g: int, n: int, j_start: int,
                    dig_ref, ext_ref, out_ref):
    """Grid (B, O, R) body for per-lane GGSW kernels (vertical packing: every
    batch lane has its own selector GGSW, shared by its G accumulators).
    Block shapes:
    dig_ref [1, 1, n_d·G, N]       int8  ((b, r) of [B, R, n_d·G, N])
    ext_ref [1, 1, 1, 8-js, 2N]    int8  ((b, o, r) of [B, O, R, 8-js, 2N])
    out_ref [1, 1, 8·G, N]         int32 ((b, o), revisited across r; row
                                          s·G+t holds partial s of acc t)

    j_start > 0 drops the lowest GGSW limb planes — these operands are
    runtime circuit-bootstrap outputs whose noise floor sits ~2^36 at
    production, so half the planes carry no signal (ops/truncation.py).
    """
    r = pl.program_id(2)

    @pl.when(r == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    # packed ladders: 4 limb planes per int32 rotation ladder (see
    # _packed_nc_planes — same -VPU-cost trick, per-lane GGSW variant)
    js_all = [j for j in range(j_start, 8)
              if any(i + j < 8 for i in range(n_d))]
    for j, ncm in _packed_nc_planes(
            n, js_all,
            lambda j: ext_ref[0, 0, 0, j - j_start: j - j_start + 1, :]):
        # one [n_d·G, N] x [N, N] dot covers every digit plane at this j
        contrib = jnp.dot(dig_ref[0, 0], ncm,
                          preferred_element_type=jnp.int32)       # [n_d·G, N]
        for i in range(n_d):
            s = i + j
            if s >= 8:
                continue
            blk = out_ref[0, 0, s * g: (s + 1) * g]
            out_ref[0, 0, s * g: (s + 1) * g] = (
                blk + contrib[i * g: (i + 1) * g])


@functools.partial(jax.jit, static_argnames=("interpret", "j_start"))
def extprod_partials_grouped(digit_planes, ext_planes,
                             interpret: bool | None = None,
                             j_start: int = 0):
    """Per-lane-kernel external product (the vertical-packing CMux shape).

    digit_planes int8 [n_d, B, G, R, N]: limb planes of the gadget digits of
    lane b's G accumulators; ext_planes int8 [8-j_start, B, R, O, 2N]: lane
    b's GGSW row limb planes (lowest j_start planes pre-dropped — noise-floor
    truncation, ops/truncation.py) -> int32 [8, B, G, O, N] partial sums
    (weight 2^(8s); rows s < j_start stay zero).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_d, b, g, r, n = digit_planes.shape
    j_cnt, b2, r2, o, two_n = ext_planes.shape
    assert (b2, r2, two_n) == (b, r, 2 * n) and j_cnt == 8 - j_start

    # [B, R, n_d·G, N]: fuse the digit planes into the matmul M axis
    dig = jnp.transpose(digit_planes, (1, 3, 0, 2, 4)).reshape(
        (b, r, n_d * g, n))
    ext = jnp.transpose(ext_planes, (1, 3, 2, 0, 4))        # [B, O, R, 8-js, 2N]
    kern = functools.partial(_kernel_grouped, n_d, g, n, j_start)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(b, o, r),
            in_specs=[
                pl.BlockSpec((1, 1, n_d * g, n),
                             lambda bb, oo, rr: (bb, rr, 0, 0)),
                pl.BlockSpec((1, 1, 1, 8 - j_start, two_n),
                             lambda bb, oo, rr: (bb, oo, rr, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 8 * g, n),
                                   lambda bb, oo, rr: (bb, oo, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, o, 8 * g, n), jnp.int32),
            interpret=interpret,
        )(dig, ext)
    out = out.reshape(b, o, 8, g, n)
    return jnp.transpose(out, (2, 0, 3, 1, 4))                 # [8, B, G, O, N]


def _kernel_grouped_fused(n_d: int, g: int, n: int, r_cnt: int, o_cnt: int,
                          j_start: int, dig_ref, ext_ref, out_ref, part_ref,
                          nc_ref=None):
    """Grid (B,) or (B, O) body: vertical-packing external product for one
    lane (o_cnt components per cell) with the u64 recombination fused in.

    The per-(b, o, r) grouped kernel ran 3200 tiny cells per VP step at
    production (128 lanes x 5 o x 5 r) and returned int32 partials to HBM for
    an XLA recombine — grid overhead and the u64-emulated shift/adds
    dominated the stage. Here one cell covers all R rows of o_cnt components
    and recombines in VMEM; each out block is written exactly once.

    dig_ref  [1, R, n_d·G, N]        int8   (lane b's digit planes, all rows)
    ext_ref  [1, o_cnt, R, 8-js, 2N] int8   (lane b's GGSW row limb planes)
    out_ref  [1, o_cnt, 2, G, N]     uint32 ((lo, hi) of lane b's G accs)
    part_ref [8, G, N]               int32  scratch (weight-2^(8s) buckets)
    """
    for o in range(o_cnt):
        part_ref[...] = jnp.zeros_like(part_ref)
        for r in range(r_cnt):
            for j, ncm in _packed_nc_planes(
                    n, [j for j in range(j_start, 8)
                        if any(i + j < 8 for i in range(n_d))],
                    lambda j, r=r, o=o: ext_ref[0, o, r, j - j_start:
                                                j - j_start + 1, :],
                    nc_ref=nc_ref):
                contrib = jnp.dot(dig_ref[0, r], ncm,
                                  preferred_element_type=jnp.int32)
                for i in range(n_d):
                    s = i + j
                    if s >= 8:
                        continue
                    part_ref[s] = part_ref[s] + contrib[i * g: (i + 1) * g]

        zero = jnp.zeros(part_ref.shape[1:], jnp.uint32)
        lo, hi = _recombine(j_start, zero, zero, part_ref)
        out_ref[0, o, 0] = lo
        out_ref[0, o, 1] = hi


@functools.partial(jax.jit, static_argnames=("n_d", "interpret", "j_start",
                                              "per_o", "nc_scratch"))
def extprod_grouped_fused(dig, ext, n_d: int, interpret: bool | None = None,
                          j_start: int = 0, per_o: bool = False,
                          nc_scratch: bool = False):
    """Per-lane-kernel external product with fused u64 recombination.

    dig: int8 [B, R, n_d·G, N] (lane b's digit limb planes, rows r);
    ext: int8 [B, O, R, 8-j_start, 2N] (lane b's GGSW row limb planes)
    -> uint32 [B, O, 2, G, N] ((lo, hi) pairs; caller combines to u64).

    per_o runs one component per grid cell (grid (B, O)); the default merges
    all components into one cell per lane (grid (B,)) — 5x fewer grid cells
    at identical work (measured 53.3 vs 58.5 ms/VP-stage). Static arg: the
    caller reads the TFHE_VP_CELLS env OUTSIDE the jit so toggling retraces.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, r, ndg, n = dig.shape
    b2, o, r2, j_cnt, two_n = ext.shape
    assert (b2, r2, two_n) == (b, r, 2 * n) and j_cnt == 8 - j_start
    assert ndg % n_d == 0

    from jax.experimental.pallas import tpu as pltpu

    g = ndg // n_d
    o_cell = 1 if per_o else o
    grid = (b, o) if per_o else (b,)

    def idx(*block_o):
        # index-map factory: per_o cells address (bb, oo); merged cells (bb)
        if per_o:
            return lambda bb, oo: (bb,) + tuple(oo if x == "o" else 0
                                                for x in block_o)
        return lambda bb: (bb,) + (0,) * len(block_o)

    kern = functools.partial(_kernel_grouped_fused, n_d, g, n, r, o_cell,
                             j_start)
    scratch = [pltpu.VMEM((8, g, n), jnp.int32)]
    if nc_scratch:
        scratch.append(pltpu.VMEM((n, two_n), jnp.int32))
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, r, ndg, n), idx(0, 0, 0)),
                pl.BlockSpec((1, o_cell, r, j_cnt, two_n), idx("o", 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, o_cell, 2, g, n), idx("o", 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, o, 2, g, n), jnp.uint32),
            scratch_shapes=scratch,
            interpret=interpret,
        )(dig, ext)
    return out


def polymul_digits_pallas_grouped_pair(digits, ext_planes, d_bound: int,
                                       j_start: int = 0):
    """Pair-domain form of polymul_digits_pallas_grouped: identical contract
    but returns ((lo, hi) u32 [B, G, O, N]) instead of u64 — the fused kernel
    already produces the pair in VMEM, and the vertical-packing stage loop
    stays in u32-pair arithmetic (no XLA u64 emulation; probe19 measured the
    u64 stage glue at ~2x the kernel itself)."""
    import os

    from tfhe_aes2_tpu.ops.torus import limbs_for_bound, split_int32_signed

    assert os.environ.get("TFHE_VP_FUSED", "1") != "0", \
        "pair path requires the fused VP kernel (TFHE_VP_FUSED)"
    n_d = limbs_for_bound(d_bound)
    d_planes = split_int32_signed(jnp.asarray(digits, jnp.int32), n_d)
    b, g, r, n = digits.shape
    dig = jnp.transpose(d_planes, (1, 3, 0, 2, 4)).reshape((b, r, n_d * g, n))
    ext = jnp.transpose(ext_planes, (1, 3, 2, 0, 4))
    # [B, O, R, 8-js, 2N]; env knobs read here, outside the jitted kernel,
    # and threaded as static args so toggling retraces (repo convention)
    pair = extprod_grouped_fused(
        dig, ext, n_d=n_d, j_start=j_start,
        per_o=os.environ.get("TFHE_VP_CELLS", "b") == "o",
        nc_scratch=os.environ.get("TFHE_VP_NC_SCRATCH", "0") == "1")
    lo = jnp.transpose(pair[:, :, 0], (0, 2, 1, 3))           # [B, G, O, N]
    hi = jnp.transpose(pair[:, :, 1], (0, 2, 1, 3))
    return lo, hi


def polymul_digits_pallas_grouped(digits, ext_planes, d_bound: int,
                                  j_start: int = 0):
    """Drop-in for polynomial.polymul_digits_conv_grouped on the pallas path.

    digits:     [B, G, R, N] int32 gadget digits (G lanes share lane b's GGSW)
    ext_planes: [8-j_start, B, R, O, 2N] int8 (vmap of split_polys_for_pallas,
                lowest j_start planes dropped by the caller — noise-floor
                truncation per ops/truncation.py)
    -> [B, G, O, N] u64, exact mod 2^64 over the kept planes.

    Default lowering is the fused per-(lane, o) kernel (extprod_grouped_fused:
    one cell per GGSW component with in-VMEM u64 recombination — the
    per-(lane, o, r) kernel ran 5x the cells and round-tripped int32 partials
    through HBM for an XLA recombine). TFHE_VP_FUSED=0 restores the old path.
    """
    import os

    from tfhe_aes2_tpu.ops.torus import (limbs_for_bound, sext_i32_to_u64,
                                         split_int32_signed)

    if os.environ.get("TFHE_VP_FUSED", "1") != "0":
        lo, hi = polymul_digits_pallas_grouped_pair(digits, ext_planes,
                                                    d_bound, j_start)
        return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))

    n_d = limbs_for_bound(d_bound)
    d_planes = split_int32_signed(jnp.asarray(digits, jnp.int32), n_d)

    parts = extprod_partials_grouped(d_planes, ext_planes, j_start=j_start)
    out = None                                                 # [8, B, G, O, N]
    for s in range(j_start, 8):
        term = sext_i32_to_u64(parts[s]) << jnp.uint64(8 * s)
        out = term if out is None else out + term
    return out
