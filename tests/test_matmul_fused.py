"""Fused limb-contraction kernel (ops/pallas/matmul.py) bit-exactness vs the
XLA exact_matmul lowering, at keyswitch- and pfKS-shaped operands (reference
keyswitch_lwe_ciphertext / private_functional_packing_keyswitch)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_aes2_tpu.ops import torus
from tfhe_aes2_tpu.ops.pallas import matmul as pmm


@pytest.mark.parametrize("b,k,n,bound,js", [
    (256, 512, 256, 1 << 2, 6),    # KS-like: base 3 digits, 2 key planes
    (256, 256, 384, 1 << 15, 2),   # pfKS-like: base 16 digits, 6 key planes
])
def test_fused_limb_matmul_matches_xla(b, k, n, bound, js, monkeypatch):
    rng = np.random.default_rng(17)
    d = jnp.asarray(rng.integers(-bound, bound + 1, (b, k), dtype=np.int64),
                    jnp.int32)
    m = jnp.asarray(rng.integers(0, 1 << 64, (k, n), dtype=np.uint64))
    m_planes = torus.split_u64_signed(m)[js:]                  # [8-js, K, N]

    assert pmm.eligible(d.shape, m_planes.shape)
    monkeypatch.setenv("TFHE_MM_FUSED", "0")
    ref = np.asarray(torus.exact_matmul(d, m_planes, bound, max_k=k,
                                        m_j_start=js))
    monkeypatch.setenv("TFHE_MM_FUSED", "1")
    got = np.asarray(torus.exact_matmul(d, m_planes, bound, max_k=k,
                                        m_j_start=js))
    np.testing.assert_array_equal(got, ref)

    # direct entry point (interpret mode on CPU)
    n_d = torus.limbs_for_bound(bound)
    d_planes = torus.split_int32_signed(d, n_d)
    got2 = np.asarray(pmm.fused_limb_matmul(d_planes, m_planes, j_start=js))
    np.testing.assert_array_equal(got2, ref)


def test_fused_limb_matmul_padded_rows_are_inert():
    """Zero-padded contraction rows (the prepared-key padding,
    keys.prepare_server_keys) change nothing."""
    rng = np.random.default_rng(18)
    b, k, n, bound, js = 256, 384, 256, 1 << 15, 2
    d = jnp.asarray(rng.integers(-bound, bound + 1, (b, k), dtype=np.int64),
                    jnp.int32)
    m = jnp.asarray(rng.integers(0, 1 << 64, (k, n), dtype=np.uint64))
    m_planes = torus.split_u64_signed(m)[js:]

    n_d = torus.limbs_for_bound(bound)
    d_planes = torus.split_int32_signed(d, n_d)
    ref = np.asarray(pmm.fused_limb_matmul(d_planes, m_planes, j_start=js))

    pad = 128
    d_pad = jnp.pad(d_planes, ((0, 0), (0, 0), (0, pad)))
    m_pad = jnp.pad(m_planes, ((0, 0), (0, pad), (0, 0)))
    got = np.asarray(pmm.fused_limb_matmul(d_pad, m_pad, j_start=js))
    np.testing.assert_array_equal(got, ref)


def test_keyswitch_padded_prepared_key_matches_raw(keys_test):
    """End-to-end: keyswitch through a hand-padded prepared KSK (the
    prepare_server_keys layout) equals the raw-u64 path."""
    from tfhe_aes2_tpu.ops import keyswitch as ksw
    from tfhe_aes2_tpu.ops.torus import split_u64_signed

    client, sks = keys_test
    p = client.params
    rng = np.random.default_rng(19)
    bits = rng.integers(0, 2, 16)
    big = jnp.asarray(client.encrypt_bits(bits))

    ref = np.asarray(ksw.keyswitch(big, jnp.asarray(sks.ksk), p))

    js = 0
    planes = split_u64_signed(jnp.asarray(sks.ksk))[js:]
    n1 = planes.shape[-1]
    n1_pad = -(-n1 // 128) * 128
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, 0), (0, n1_pad - n1)))
    got = np.asarray(ksw.keyswitch(big, planes, p))
    np.testing.assert_array_equal(got, ref)
