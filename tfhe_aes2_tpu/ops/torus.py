"""Exact 2^64-torus arithmetic for TPU.

Torus elements are jnp.uint64. The MXU cannot multiply u64, so every large
contraction is decomposed into *balanced signed base-256 limb planes* (int8)
and evaluated as int8 x int8 -> int32 matmuls — the native exact mode of the
TPU MXU — then recombined with wrapping u64 shifts/adds on the VPU.

Balanced split: x ≡ Σ_i l_i·256^i (mod 2^64) with l_i ∈ [-128, 128). Computed
branch-free with the offset trick: y = x + 0x8080..80; l_i = byte_i(y) - 128.
Because arithmetic is mod 2^64 the final borrow vanishes, so 8 limbs suffice.

Replaces (for TPU) the reference's u64 torus arithmetic inside tfhe-rs
(`lwe_linear_algebra`, `polynomial_algorithms`; SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

U64 = jnp.uint64
I64 = jnp.int64

_OFFSET64 = jnp.uint64(0x8080808080808080)


def encode_bit(bit):
    """bit -> torus encoding at 2^63 (reference shortint_woppbs_1bit.rs:125-128)."""
    return jnp.asarray(bit, U64) << jnp.uint64(63)


def decode_bit(enc):
    """torus -> bit via threshold decode (reference shortint_woppbs_1bit.rs:130-132)."""
    enc = jnp.asarray(enc, U64)
    return ((enc + (jnp.uint64(1) << jnp.uint64(62))) >> jnp.uint64(63)) & jnp.uint64(1)


def split_u64_signed(x):
    """u64 tensor [...] -> int8 limb planes [8, ...], balanced base-256.

    Σ_i planes[i]·256^i ≡ x (mod 2^64), planes[i] ∈ [-128, 128).
    """
    x = jnp.asarray(x, U64)
    y = x + _OFFSET64
    planes = [
        (((y >> jnp.uint64(8 * i)) & jnp.uint64(0xFF)).astype(jnp.int32) - 128).astype(jnp.int8)
        for i in range(8)
    ]
    return jnp.stack(planes, axis=0)


def split_int32_signed(d, n_limbs: int):
    """int32 tensor [...] with |d| < 2^(8*n_limbs - 1) -> int8 planes [n_limbs, ...].

    Balanced base-256; exact (the top limb absorbs the sign).
    """
    d = jnp.asarray(d, jnp.int32)
    offset = jnp.int32(sum(128 << (8 * i) for i in range(n_limbs - 1)))
    y = d + offset
    planes = []
    for i in range(n_limbs):
        if i < n_limbs - 1:
            p = ((y >> (8 * i)) & 0xFF) - 128
        else:
            p = y >> (8 * i)  # arithmetic shift keeps the sign; |top| <= 127
        planes.append(p.astype(jnp.int8))
    return jnp.stack(planes, axis=0)


def limbs_for_bound(bound: int) -> int:
    """Number of balanced base-256 limbs needed for |d| <= bound (bound < 2^(8L-1))."""
    l = 1
    while bound >= (1 << (8 * l - 1)):
        l += 1
    return l


def sext_i32_to_u64(x):
    """int32 -> u64 two's complement (sign extend)."""
    return jnp.asarray(x, jnp.int64).astype(U64)


def exact_matmul(d, m_u64, d_bound: int, dn: str = "bk,ko->bo", max_k: int | None = None):
    """Exact wrapping-u64 contraction out = einsum(dn, d, m) mod 2^64.

    d: integer tensor (digits), |d| <= d_bound. m_u64: uint64 tensor.
    Evaluated as int8 limb-plane matmuls with int32 accumulation (MXU-native),
    recombined with u64 shifts. `dn` is an einsum spec with exactly one
    contracted index; `max_k` (product of contracted extents) guards int32
    overflow and is inferred from the spec when the operands make it obvious.

    This is the single hot primitive of the framework — keyswitch, pfKS and
    (via negacirculant matrices) every polynomial product route through it.
    """
    d = jnp.asarray(d)
    m_u64 = jnp.asarray(m_u64, U64)

    n_d = limbs_for_bound(d_bound)
    d_planes = split_int32_signed(d.astype(jnp.int32), n_d)      # [n_d, ...d]
    m_planes = split_u64_signed(m_u64)                           # [8, ...m]

    # int32 overflow guard: K * 127 * 127 < 2^31
    if max_k is not None:
        assert max_k * 127 * 127 < 2 ** 31, "contraction too long for int32 accumulation"

    # Accumulate partial sums per total shift s = i + j (weight 256^s); s >= 8
    # vanishes mod 2^64.
    out = None
    for s in range(8):
        partial = None
        for i in range(min(n_d, s + 1)):
            j = s - i
            if j >= 8:
                continue
            p = jnp.einsum(dn, d_planes[i], m_planes[j],
                           preferred_element_type=jnp.int32)
            partial = p if partial is None else partial + p
        if partial is None:
            continue
        term = sext_i32_to_u64(partial) << jnp.uint64(8 * s)
        out = term if out is None else out + term
    return out
