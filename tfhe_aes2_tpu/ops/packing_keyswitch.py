"""LWE -> GLWE packing keyswitch (tfhe-rs `lwe_packing_keyswitch`).

Used by the shortint_1bit tree-PBS model (reference call sites
shortint_1bit.rs:179-190, 417, 461, 504): switch an LWE ciphertext under the
small key into a GLWE ciphertext under S with the message at coefficient 0,
or pack a list at successive monomial positions.

out = (0, b·X^0) - Σ_{i,l} dec(a_i)_l · PKSK[i, l]
with PKSK[i, l] = GLWE_S(s_i · g_l).
"""

from __future__ import annotations

import jax.numpy as jnp

from tfhe_aes2_tpu.ops import decomposition
from tfhe_aes2_tpu.ops.params import WopbsParams
from tfhe_aes2_tpu.ops.torus import U64, exact_matmul


def pack_lwe(lwe_small, pksk, params: WopbsParams):
    """[..., n+1] (small key) -> GLWE [..., k+1, N], message at coeff 0."""
    p = params
    lwe_small = jnp.asarray(lwe_small, U64)
    pksk = jnp.asarray(pksk, U64)
    n_in, levels, k1, n = pksk.shape
    a, b = lwe_small[..., :-1], lwe_small[..., -1]

    digits = decomposition.decompose(a, p.ks_base_log, p.ks_level)  # [..., n_in, L]
    batch = digits.shape[:-2]
    d2 = digits.reshape((-1, n_in * levels))
    m2 = pksk.reshape((n_in * levels, k1 * n))
    acc = exact_matmul(d2, m2, decomposition.digit_bound(p.ks_base_log),
                       max_k=n_in * levels)
    out = (jnp.uint64(0) - acc).reshape(batch + (k1, n))
    return out.at[..., -1, 0].add(b)


def pack_lwe_list(lwe_list, pksk, params: WopbsParams):
    """[..., M, n+1] -> GLWE [..., k+1, N] with message m_j at coefficient j
    (tfhe-rs keyswitch_lwe_ciphertext_list_and_pack_in_glwe_ciphertext)."""
    from tfhe_aes2_tpu.ops import polynomial

    lwe_list = jnp.asarray(lwe_list, U64)
    m = lwe_list.shape[-2]
    glwes = pack_lwe(lwe_list, pksk, params)          # [..., M, k+1, N]
    out = None
    for j in range(m):
        term = polynomial.monomial_mul_static(glwes[..., j, :, :], j)
        out = term if out is None else out + term
    return out
