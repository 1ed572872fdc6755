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



def encode_bit(bit):
    """bit -> torus encoding at 2^63 (reference shortint_woppbs_1bit.rs:125-128)."""
    return jnp.asarray(bit, U64) << jnp.uint64(63)


def decode_bit(enc):
    """torus -> bit via threshold decode (reference shortint_woppbs_1bit.rs:130-132)."""
    enc = jnp.asarray(enc, U64)
    return ((enc + (jnp.uint64(1) << jnp.uint64(62))) >> jnp.uint64(63)) & jnp.uint64(1)


def split_u64_signed(x, limb_bits: int = 8):
    """u64 tensor [...] -> signed limb planes [64/limb_bits, ...], balanced
    base-2^limb_bits: Σ_i planes[i]·2^(w·i) ≡ x (mod 2^64),
    planes[i] ∈ [-2^(w-1), 2^(w-1)). int8 planes for w=8, int32 for w=16.
    """
    w = limb_bits
    assert 64 % w == 0
    n = 64 // w
    x = jnp.asarray(x, U64)
    offset = jnp.uint64(sum(1 << (w - 1 + w * i) for i in range(n)))
    y = x + offset
    half = 1 << (w - 1)
    mask = jnp.uint64((1 << w) - 1)
    out_dtype = jnp.int8 if w == 8 else jnp.int32
    planes = [
        (((y >> jnp.uint64(w * i)) & mask).astype(jnp.int64) - half).astype(out_dtype)
        for i in range(n)
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


def exact_matmul(d, m_u64, d_bound: int, dn: str = "bk,ko->bo", max_k: int | None = None,
                 m_j_start: int = 0):
    """Exact wrapping-u64 contraction out = einsum(dn, d, m) mod 2^64.

    d: integer tensor (digits), |d| <= d_bound. m_u64: uint64 tensor.
    `dn` is an einsum spec with exactly one contracted index; `max_k` (product
    of contracted extents) guards accumulator overflow.

    `m_j_start` drops m's limb planes 0..m_j_start-1 (noise-floor truncation,
    ops/truncation.py): only valid when m is an encryption whose noise std
    covers the dropped weight. When m arrives pre-split with fewer than 8
    planes (prepared server keys), the caller passes the matching j_start.

    This is the single hot primitive of the framework — keyswitch, pfKS and
    (via negacirculant matrices) every polynomial product route through it.
    Two exact lowerings:
      * TPU: int8 limb planes on both operands, int32 MXU accumulation.
      * CPU: full digits x int8 limb planes of m in f64 (Eigen DGEMM);
        exact while d_bound·128·K < 2^53. XLA CPU has no fast int8 GEMM.
    """
    d = jnp.asarray(d)
    # m may arrive pre-split as int8 limb planes [8-j_start, ...m] (prepared
    # server keys, keys.prepare_server_keys): the per-call split of a ~400MB
    # key tensor otherwise dominates small contractions.
    m_u64 = jnp.asarray(m_u64) if getattr(m_u64, "dtype", None) == jnp.int8 \
        else jnp.asarray(m_u64, U64)

    if (jax.default_backend() == "cpu" and m_u64.dtype != jnp.int8
            and m_j_start == 0):
        # CPU oracle path stays exact (truncation is a TPU-throughput tool);
        # an explicit m_j_start routes through the limb-plane path so the
        # truncated semantics hold on every backend.
        return _exact_matmul_f64(d, m_u64, d_bound, dn, max_k)
    return _exact_matmul_i8(d, m_u64, d_bound, dn, max_k, m_j_start)


def _exact_matmul_i8(d, m_u64, d_bound: int, dn: str, max_k: int | None,
                     m_j_start: int = 0):
    n_d = limbs_for_bound(d_bound)
    d_planes = split_int32_signed(d.astype(jnp.int32), n_d)      # [n_d, ...d]
    if m_u64.dtype == jnp.int8:
        m_planes = m_u64                                         # pre-split
    else:
        m_planes = split_u64_signed(m_u64)[m_j_start:]           # [8-js, ...m]
    assert m_planes.shape[0] == 8 - m_j_start, \
        f"m planes {m_planes.shape[0]} != 8 - j_start {m_j_start}"

    # int32 overflow guard: n_terms * K * 127 * 127 < 2^31
    if max_k is not None:
        assert min(n_d, 8) * max_k * 127 * 127 < 2 ** 31, \
            "contraction too long for int32 accumulation"

    # fused pallas path (TPU): the limb dots + u64 recombination run in one
    # kernel with VMEM buckets — the XLA lowering below materializes every
    # int32 partial and u64 term through HBM (keyswitch/pfKS hot path).
    # Gate: TFHE_MM_FUSED=0 disables; ineligible shapes fall through.
    if dn == "bk,ko->bo" and m_planes.ndim == 3 and d.ndim == 2:
        import os
        if os.environ.get("TFHE_MM_FUSED", "1") != "0":
            from tfhe_aes2_tpu.ops.pallas import matmul as pmm
            if pmm.eligible(d.shape, m_planes.shape):
                return pmm.fused_limb_matmul(d_planes, m_planes, m_j_start)

    # Accumulate partial sums per total shift s = i + j (weight 256^s); s >= 8
    # vanishes mod 2^64.
    out = None
    for s in range(8):
        partial = None
        for i in range(min(n_d, s + 1)):
            j = s - i
            if j >= 8 or j < m_j_start:
                continue
            p = jnp.einsum(dn, d_planes[i], m_planes[j - m_j_start],
                           preferred_element_type=jnp.int32)
            partial = p if partial is None else partial + p
        if partial is None:
            continue
        term = sext_i32_to_u64(partial) << jnp.uint64(8 * s)
        out = term if out is None else out + term
    return out


def _exact_matmul_f64(d, m_u64, d_bound: int, dn: str, max_k: int | None):
    w = 16  # 4 limb planes; exact while d_bound·2^(w-1)·K < 2^53
    if max_k is not None:
        assert d_bound * (1 << (w - 1)) * max_k < 2 ** 53, \
            "contraction too long for f64"
    d64 = d.astype(jnp.float64)
    m_planes = split_u64_signed(m_u64, w).astype(jnp.float64)    # [64/w, ...m]
    out = None
    for j in range(64 // w):
        p = jnp.einsum(dn, d64, m_planes[j])
        term = p.astype(jnp.int64).astype(U64) << jnp.uint64(w * j)
        out = term if out is None else out + term
    return out
