"""Pallas external-product kernel: the blind-rotate CMux inner loop.

Computes, for one BSK entry, the negacyclic products

    out[b, o, m] = Σ_{r,j} digits[b, r, j] · bsk[r, o][(m - j) mod± N]

as int8 MXU matmuls against negacirculant tiles built **inside VMEM** by a
log-doubling chain of static lane rotations (pltpu.roll) — the O(N²)
negacirculant never touches HBM, eliminating the gather/im2col bottlenecks of
the XLA conv/gather formulations (bench_probe*.py).

Index algebra: with ext = [p, -p] (length 2N), NC[j, m] = ext[(m-j) mod 2N] =
rot[i, m] for i = (2N - j) mod 2N where rot[i] = rotate_left(ext, i). Rows
j ∈ [1, N) map to i ∈ (N, 2N); j = 0 maps to rotation 0 = -rot[N] (ext is
negacyclic: rotate_left(ext, N) = -ext). Reversing (and sign-fixing) the
digit vector instead of the matrix keeps rows ascending:

    out[m] = Σ_{t=0}^{N-1} drev[t] · rot[N + t, m]
    with drev[0] = -d[0], drev[t] = d[N - t] (t >= 1)

— a single [B, N] x [N, N] int8 matmul per (r, digit-plane, key-plane),
accumulated in int32 per limb-shift s and recombined to u64 outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rot_rows_n_to_2n(ext_row):
    """ext_row [1, 2N] int8 -> [N, 2N] int8 where row t = rotate_left(ext, N+t).

    log-doubling: start with rotate_left(ext, N); M_{k+1} = [M_k ;
    rotate_left(M_k, 2^k)]. Mosaic's dynamic_rotate only handles 32-bit
    lanes, so the ladder runs on an int32 widening and casts back once.
    """
    two_n = ext_row.shape[-1]
    n = two_n // 2
    # pltpu.roll takes non-negative shifts; rotate_left(s) = roll(2N - s).
    # Shifts must be i32 (x64 mode would weak-type python ints to i64).
    m = pltpu.roll(ext_row.astype(jnp.int32), jnp.int32(n), 1)
    size = 1
    while size < n:
        m = jnp.concatenate(
            [m, pltpu.roll(m, jnp.int32(two_n - size), 1)], axis=0)
        size *= 2
    return m.astype(jnp.int8)                # [N, 2N]


def _kernel(n_d: int, o_cnt: int, r_cnt: int, n: int,
            drev_ref, ext_ref, out_ref):
    """Gridless. Shapes:
    drev_ref [n_d, B, R, N]   int8  (sign-fixed reversed digits)
    ext_ref  [O, 8, R, 2N]    int8  (doubled BSK limb planes)
    out_ref  [O, 8, B, N]     int32 (partial sums per shift s)
    """
    for o in range(o_cnt):
        acc = [None] * 8
        for r in range(r_cnt):
            for j in range(8):
                if not any(i + j < 8 for i in range(n_d)):
                    continue
                ext = ext_ref[o, j, r: r + 1, :]      # [1, 2N]
                rot = _rot_rows_n_to_2n(ext)          # [N, 2N]
                ncm = rot[:, :n]                      # [N, N]
                for i in range(n_d):
                    s = i + j
                    if s >= 8:
                        continue
                    contrib = jnp.dot(drev_ref[i, :, r, :], ncm,
                                      preferred_element_type=jnp.int32)
                    acc[s] = contrib if acc[s] is None else acc[s] + contrib
        for s in range(8):
            if acc[s] is not None:
                out_ref[o, s] = acc[s]
            else:
                out_ref[o, s] = jnp.zeros_like(out_ref[o, s])


def _kernel_grid(n_d: int, n: int, drev_ref, ext_ref, out_ref):
    """Grid (O, R) body — ~75x smaller Mosaic program than the gridless
    kernel (whose full unroll of 600 rotation ladders compiled in minutes).
    Block shapes:
    drev_ref [1, n_d, B, N]  int8  (row r of [R, n_d, B, N])
    ext_ref  [1, 1, 8, 2N]   int8  ((o, r) of [O, R, 8, 2N])
    out_ref  [1, 8, B, N]    int32 (output block o, revisited across r)
    """
    r = pl.program_id(1)

    @pl.when(r == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    for j in range(8):
        if not any(i + j < 8 for i in range(n_d)):
            continue
        ext = ext_ref[0, 0, j: j + 1, :]              # [1, 2N]
        rot = _rot_rows_n_to_2n(ext)                  # [N, 2N]
        ncm = rot[:, :n]                              # [N, N]
        for i in range(n_d):
            s = i + j
            if s >= 8:
                continue
            contrib = jnp.dot(drev_ref[0, i], ncm,
                              preferred_element_type=jnp.int32)
            out_ref[0, s] = out_ref[0, s] + contrib


def reverse_digits(digits):
    """int32 digits [..., N] -> sign-fixed reversed digits for the kernel:
    drev[0] = -d[0] (rotation-N sign trick), drev[t] = d[N-t]. Done on int32
    BEFORE limb splitting (int8 negation of -128 would wrap)."""
    return jnp.concatenate(
        [-digits[..., :1], jnp.flip(digits[..., 1:], axis=-1)], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret", "gridless"))
def extprod_partials(drev_planes, ext_planes, interpret: bool | None = None,
                     gridless: bool = False):
    """drev_planes int8 [n_d, B, R, N] (limb planes of reverse_digits output);
    ext_planes int8 [8, R, O, 2N] -> int32 [8, B, O, N] partial sums
    (weight 2^(8s))."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    drev = drev_planes
    n_d, b, r, n = drev.shape
    _, r2, o, two_n = ext_planes.shape
    assert r2 == r and two_n == 2 * n

    if gridless:
        ext_o_first = jnp.moveaxis(ext_planes, 2, 0)           # [O, 8, R, 2N]
        kern = functools.partial(_kernel, n_d, o, r, n)
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((o, 8, b, n), jnp.int32),
            interpret=interpret,
        )(drev, ext_o_first)
        return jnp.transpose(out, (1, 2, 0, 3))                # [8, B, O, N]

    drev_r_first = jnp.moveaxis(drev, 2, 0)                    # [R, n_d, B, N]
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
        )(drev_r_first, ext_or)
    return jnp.transpose(out, (1, 2, 0, 3))                    # [8, B, O, N]


def split_polys_for_pallas(polys):
    """[R, O, N] u64 -> ext limb planes int8 [8, R, O, 2N] (ext = [p, -p])."""
    from tfhe_aes2_tpu.ops.polynomial import negacyclic_extend
    from tfhe_aes2_tpu.ops.torus import split_u64_signed

    ext = negacyclic_extend(jnp.asarray(polys, jnp.uint64))    # [R, O, 2N]
    return split_u64_signed(ext)                               # [8, R, O, 2N]
