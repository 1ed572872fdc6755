"""Negacyclic polynomial arithmetic in Z_{2^64}[X]/(X^N + 1).

TPU-native replacement for the reference's FFT-based polynomial layer
(tfhe-rs `polynomial_algorithms` + fft64, driven via
`blind_rotate_assign_mem_optimized`; SURVEY.md §2.3). Instead of an approximate
f64 FFT we use *exact* negacirculant matrix products on the MXU: a product
a ⊛ b is a matmul of `a`'s coefficients against the negacirculant matrix of
`b`, evaluated in int8 limb planes with int32 accumulation (ops/torus.py).
This is exact mod 2^64 (no FFT rounding) and maps the hot loop onto the
systolic array.

Monomial multiplications (the rotations in blind rotation) are index
gathers on the doubled coefficient vector [p, -p].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.ops.torus import U64, exact_matmul


def negacyclic_extend(polys):
    """[..., N] u64 -> [..., 2N]: concat(p, -p). ext[(m) mod 2N] realizes X^m signs."""
    polys = jnp.asarray(polys, U64)
    return jnp.concatenate([polys, jnp.uint64(0) - polys], axis=-1)


def _nc_index(n: int) -> np.ndarray:
    """idx[j, m] = (m - j) mod 2N so that NC[j, m] = ext[idx[j, m]] and
    (a ⊛ b)[m] = Σ_j a[j] · NC(b)[j, m]."""
    j = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return ((m - j) % (2 * n)).astype(np.int32)


def nc_matrix(polys):
    """[..., N] u64 -> negacirculant [..., N(j), N(m)] u64."""
    polys = jnp.asarray(polys, U64)
    n = polys.shape[-1]
    ext = negacyclic_extend(polys)
    idx = jnp.asarray(_nc_index(n))
    return jnp.take(ext, idx, axis=-1)


def monomial_mul_static(polys, t: int):
    """X^t · polys for a STATIC t — slice+concat+negate, no gather."""
    polys = jnp.asarray(polys, U64)
    n = polys.shape[-1]
    t = t % (2 * n)
    if t == 0:
        return polys
    if t >= n:
        return jnp.uint64(0) - monomial_mul_static(polys, t - n)
    head = jnp.uint64(0) - polys[..., n - t:]
    return jnp.concatenate([head, polys[..., : n - t]], axis=-1)


def monomial_mul(polys, t):
    """X^t * polys (negacyclic). polys [..., N] u64; t int tensor broadcastable
    to polys.shape[:-1], values in [0, 2N).

    (X^t p)[m] = ext[(m - t) mod 2N]  with ext = [p, -p].
    """
    polys = jnp.asarray(polys, U64)
    n = polys.shape[-1]
    ext = negacyclic_extend(polys)
    t = jnp.asarray(t, jnp.int32)
    m = jnp.arange(n, dtype=jnp.int32)
    idx = (m - t[..., None]) % (2 * n)
    idx = jnp.broadcast_to(idx, polys.shape[:-1] + (n,))
    return jnp.take_along_axis(ext, idx.astype(jnp.int32), axis=-1)


def polymul_digits_shared(digits, polys, d_bound: int):
    """Exact Σ_r digits[..., r, :] ⊛ polys[r, o, :] -> [..., O, N] u64.

    digits: [..., R, N] signed ints with |d| <= d_bound (gadget digits).
    polys:  [R, O, N] u64 shared across the batch (e.g. one BSK entry's rows).

    The negacirculant of `polys` is materialized and contracted via
    exact_matmul; a fused Pallas kernel (ops/pallas) replaces this on TPU to
    avoid materializing the O(R·O·N^2) matrix in HBM.
    """
    digits = jnp.asarray(digits)
    polys = jnp.asarray(polys, U64)
    r, o, n = polys.shape
    assert digits.shape[-2:] == (r, n)
    ncm = nc_matrix(polys)  # [R, O, N, N]
    batch_shape = digits.shape[:-2]
    d2 = digits.reshape((-1, r * n))
    m2 = jnp.transpose(ncm, (0, 2, 1, 3)).reshape((r * n, o * n))
    out = exact_matmul(d2, m2, d_bound, dn="bk,ko->bo", max_k=r * n)
    return out.reshape(batch_shape + (o, n))


def polymul_digits_grouped(digits, polys, d_bound: int, group_ndim: int = 0):
    """digits [..., G..., R, N] x polys [..., R, O, N] -> [..., G..., O, N].

    `polys` is batched like `digits` minus `group_ndim` group axes — e.g. in
    vertical packing, one GGSW per byte drives many LUT-polynomial lanes. The
    negacirculant is materialized once per polys batch element, not per lane.
    """
    digits = jnp.asarray(digits)
    polys = jnp.asarray(polys, U64)
    *pbatch, r, o, n = polys.shape
    assert digits.shape[-2:] == (r, n)
    group_shape = digits.shape[len(pbatch): -2]
    assert len(group_shape) == group_ndim
    assert tuple(digits.shape[: len(pbatch)]) == tuple(pbatch)
    ncm = nc_matrix(polys)  # [..., R, O, N(j), N(m)]
    g = 1
    for s in group_shape:
        g *= s
    d2 = digits.reshape((-1, g, r, n))
    m2 = ncm.reshape((-1, r, o, n, n))
    out = exact_matmul(d2, m2, d_bound, dn="bgrj,brojm->bgom", max_k=r * n)
    return out.reshape(tuple(pbatch) + group_shape + (o, n))


def polymul_digits_batched(digits, polys, d_bound: int):
    """digits [..., R, N], polys [..., R, O, N] (same batch) -> [..., O, N]."""
    return polymul_digits_grouped(digits, polys, d_bound, group_ndim=0)


# ---------------- convolution formulation (TPU hot path) ----------------
# A negacyclic product is a length-N linear convolution folded at N
# (c[m] = lin[m] - lin[m+N]). XLA's conv primitive maps this onto the MXU
# with int8 operands directly — no negacirculant materialization, no u64
# in the loop. The u64 key polynomials are pre-split once into balanced
# signed base-256 limb planes.

from tfhe_aes2_tpu.ops.torus import (  # noqa: E402
    limbs_for_bound, sext_i32_to_u64, split_int32_signed, split_u64_signed)


def split_polys_for_conv(polys):
    """[R, O, N] u64 -> conv kernels int8 [8, O, R, N], pre-flipped so that
    lax.conv (a correlation) computes a true convolution."""
    polys = jnp.asarray(polys, U64)
    planes = split_u64_signed(polys)                    # [8, R, O, N]
    planes = jnp.flip(jnp.moveaxis(planes, 2, 1), axis=-1)  # [8, O, R, N]
    return planes


def polymul_digits_conv_grouped(digits, kernel_planes, d_bound: int):
    """Per-batch-element kernels shared over a group axis, via grouped conv.

    digits:        [B, G, R, N] int32 (G lanes share batch element b's GGSW)
    kernel_planes: [8, B, O, R, N] int8 (vmap of split_polys_for_conv)
    -> [B, G, O, N] u64
    """
    digits = jnp.asarray(digits)
    b, g, r, n = digits.shape
    _, b2, o, r2, _ = kernel_planes.shape
    assert (b2, r2) == (b, r)
    n_d = limbs_for_bound(d_bound)
    d_planes = split_int32_signed(digits.astype(jnp.int32), n_d)

    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(0, 1, 2), rhs_spec=(0, 1, 2), out_spec=(0, 1, 2))

    partials = {}
    for i in range(n_d):
        # lhs: [G, B·R, N]; rhs: [B·O, R, N]; groups = B
        lhs = jnp.moveaxis(d_planes[i], 0, 1).reshape(g, b * r, n)
        for j in range(8):
            s = i + j
            if s >= 8:
                continue
            rhs = kernel_planes[j].reshape(b * o, r, n)
            lin = jax.lax.conv_general_dilated(
                lhs, rhs, window_strides=(1,), padding=[(n - 1, n - 1)],
                dimension_numbers=dn, feature_group_count=b,
                preferred_element_type=jnp.int32)       # [G, B·O, 2N-1]
            partials[s] = lin if s not in partials else partials[s] + lin

    out = None
    for s, lin in partials.items():
        fold = lin[..., :n].at[..., : n - 1].add(-lin[..., n:])
        term = sext_i32_to_u64(fold) << jnp.uint64(8 * s)
        out = term if out is None else out + term
    return jnp.moveaxis(out.reshape(g, b, o, n), 0, 1)   # [B, G, O, N]


def conv_partials(digits, kernel_planes, d_bound: int):
    """int8 convolution partial sums, folded negacyclically.

    digits:        [B, R, N] int32 gadget digits, |d| <= d_bound
    kernel_planes: [8, O, R, N] int8 from split_polys_for_conv
    -> {s: int32 [B, O, N]} with weight 2^(8s).
    """
    digits = jnp.asarray(digits)
    n = digits.shape[-1]
    n_d = limbs_for_bound(d_bound)
    d_planes = split_int32_signed(digits.astype(jnp.int32), n_d)  # [n_d, B, R, N]

    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(0, 1, 2),   # [batch, feature(R), spatial]
        rhs_spec=(0, 1, 2),   # [out(O), in(R), spatial]
        out_spec=(0, 1, 2))

    partials = {}
    for i in range(n_d):
        for j in range(8):
            s = i + j
            if s >= 8:
                continue
            lin = jax.lax.conv_general_dilated(
                d_planes[i], kernel_planes[j],
                window_strides=(1,), padding=[(n - 1, n - 1)],
                dimension_numbers=dn,
                preferred_element_type=jnp.int32)       # [B, O, 2N-1]
            partials[s] = lin if s not in partials else partials[s] + lin

    return {s: lin[..., :n].at[..., : n - 1].add(-lin[..., n:])
            for s, lin in partials.items()}


def polymul_digits_conv(digits, kernel_planes, d_bound: int):
    """Σ_r digits[..., r, :] ⊛ polys[r, o, :] via int8 convolutions
    -> [B, O, N] u64, exact mod 2^64."""
    out = None
    for s, fold in conv_partials(digits, kernel_planes, d_bound).items():
        term = sext_i32_to_u64(fold) << jnp.uint64(8 * s)
        out = term if out is None else out + term
    return out
