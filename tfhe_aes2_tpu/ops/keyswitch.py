"""LWE keyswitching: big->small (KS) and private functional packing (PFKS).

TPU-native equivalents of tfhe-rs `keyswitch_lwe_ciphertext` and
`private_functional_packing_keyswitch` (the pfKS inside circuit
bootstrapping). Both are exact int8-limb matmuls of gadget digits against the
keyswitch key tensors — MXU-shaped, batched over all concurrent lanes.

`keyswitch` is also the whole of the reference's `extract_dual_bit_from_bit`
(shortint_woppbs_1bit.rs:339-363): with one extracted bit at DeltaLog(63),
tfhe-rs bit extraction degenerates to a single big->small keyswitch.
"""

from __future__ import annotations

import jax.numpy as jnp

from tfhe_aes2_tpu.ops import decomposition
from tfhe_aes2_tpu.ops.params import WopbsParams
from tfhe_aes2_tpu.ops.torus import U64, exact_matmul


def keyswitch(lwe_big, ksk, params: WopbsParams):
    """[..., kN+1] under the big key -> [..., n+1] under the small key.

    out = (0, b) - Σ_{i,l} dec(a_i)_l · KSK[i, l]
    """
    p = params
    lwe_big = jnp.asarray(lwe_big, U64)
    if getattr(ksk, "dtype", None) == jnp.int8:   # prepared limb planes
        nj, kn, levels, n1 = ksk.shape
        js = 8 - nj           # planes dropped at prepare time (truncation.py)
        m2 = ksk.reshape((nj, kn * levels, n1))
    else:
        ksk = jnp.asarray(ksk, U64)
        js = 0
        kn, levels, n1 = ksk.shape
        m2 = ksk.reshape((kn * levels, n1))
    a, b = lwe_big[..., :-1], lwe_big[..., -1]

    digits = decomposition.decompose(a, p.ks_base_log, p.ks_level)   # [..., kN, L]
    batch = digits.shape[:-2]
    d2 = digits.reshape((-1, kn * levels))
    acc = exact_matmul(d2, m2, decomposition.digit_bound(p.ks_base_log),
                       max_k=kn * levels, m_j_start=js)
    acc = acc.reshape(batch + (n1,))
    if n1 > p.lwe_dimension + 1:   # prepared key padded to a lane multiple
        acc = acc[..., : p.lwe_dimension + 1]

    out = jnp.uint64(0) - acc
    return out.at[..., -1].add(b)


def pfks(lwe_big, pfpksk_u, params: WopbsParams):
    """Private functional packing keyswitch: LWE [..., kN+1] -> GLWE [..., k+1, N].

    pfpksk_u: [kN+1, L, k+1, N] for one function f_u.
    out = Σ_l dec(b)_l·K[kN, l] - Σ_{i,l} dec(a_i)_l·K[i, l]  = GLWE(f_u(m)).
    """
    return pfks_all(lwe_big, pfpksk_u[:, :, None], params)[..., 0, :, :]


def pfks_all(lwe_big, pfpksk, params: WopbsParams):
    """Apply all k+1 circuit-bootstrap functions in one contraction.

    pfpksk: [kN+1, L, U, k+1, N] -> GLWEs [..., U, k+1, N].
    The gadget decomposition runs once; the U functions share one matmul
    (the reference applies the pfKSs serially per GGSW column).
    """
    p = params
    lwe_big = jnp.asarray(lwe_big, U64)
    if getattr(pfpksk, "dtype", None) == jnp.int8:  # prepared limb planes
        nj, kn1, levels, u_cnt, k1, n = pfpksk.shape
        js = 8 - nj           # planes dropped at prepare time (truncation.py)
        m2 = pfpksk.reshape((nj, kn1 * levels, u_cnt * k1 * n))
    else:
        pfpksk = jnp.asarray(pfpksk, U64)
        js = 0
        kn1, levels, u_cnt, k1, n = pfpksk.shape
        m2 = pfpksk.reshape((kn1 * levels, u_cnt * k1 * n))

    digits = decomposition.decompose(lwe_big, p.pfks_base_log, p.pfks_level)
    # negate the mask digits, keep the body digit
    kn1_in = digits.shape[-2]
    sign = jnp.concatenate(
        [jnp.full((kn1_in - 1,), -1, jnp.int32), jnp.ones((1,), jnp.int32)])
    digits = digits * sign[:, None]
    if kn1 > kn1_in:   # prepared key row-padded to a lane multiple
        widths = [(0, 0)] * digits.ndim
        widths[-2] = (0, kn1 - kn1_in)
        digits = jnp.pad(digits, widths)

    batch = digits.shape[:-2]
    d2 = digits.reshape((-1, kn1 * levels))
    out = exact_matmul(d2, m2, decomposition.digit_bound(p.pfks_base_log),
                       max_k=kn1 * levels, m_j_start=js)
    return out.reshape(batch + (u_cnt, k1, n))
