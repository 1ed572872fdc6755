"""Keyswitch, scaling PBS, and pfKS tests against decrypted phases."""

import numpy as np
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import blind_rotate as br
from tfhe_aes2_tpu.ops import keyswitch as ks


def _decrypt_small(client, cts):
    cts = np.asarray(cts, dtype=np.uint64)
    with np.errstate(over="ignore"):
        phase = cts[..., -1] - (cts[..., :-1] * client.lwe_sk).sum(axis=-1, dtype=np.uint64)
    return phase


def _decrypt_glwe_phase(client, glwe):
    """GLWE [..., k+1, N] -> phase poly [..., N] via numpy negacyclic mult."""
    glwe = np.asarray(glwe, dtype=np.uint64)
    k, n = client.glwe_sk.shape
    a, b = glwe[..., :-1, :], glwe[..., -1, :]
    acc = b.copy()
    with np.errstate(over="ignore"):
        for u in range(k):
            s = client.glwe_sk[u]
            ext = np.concatenate([s, np.uint64(0) - s])
            j = np.arange(n)[:, None]
            m = np.arange(n)[None, :]
            nc = ext[(m - j) % (2 * n)]
            acc -= a[..., u, :] @ nc
    return acc


def _signed(x):
    return np.asarray(x, dtype=np.uint64).astype(np.int64)


def test_keyswitch_preserves_bit(keys_test):
    client, sks = keys_test
    p = client.params
    bits = np.array([0, 1, 1, 0])
    cts = client.encrypt_bits(bits)
    out = np.asarray(ks.keyswitch(jnp.asarray(cts), jnp.asarray(sks.ksk), p))
    phase = _decrypt_small(client, out)
    decoded = ((phase + np.uint64(1 << 62)) >> np.uint64(63)) & np.uint64(1)
    np.testing.assert_array_equal(decoded, bits)
    # noise must stay well below the decode threshold
    err = _signed(phase - (bits.astype(np.uint64) << np.uint64(63)))
    assert np.abs(err).max() < 1 << 55


def test_pbs_bit_to_level(keys_test):
    client, sks = keys_test
    p = client.params
    bits = np.array([0, 1, 0, 1])
    cts = client.encrypt_bits(bits)
    dual = ks.keyswitch(jnp.asarray(cts), jnp.asarray(sks.ksk), p)
    target_log = p.cbs_base_log  # level 0
    out = np.asarray(br.pbs_bit_to_level(dual, jnp.asarray(sks.bsk), target_log, p))
    phase = client.decrypt_phase(out)
    expect = bits.astype(np.uint64) << np.uint64(64 - target_log)
    err = _signed(phase - expect)
    assert np.abs(err).max() < 1 << (64 - target_log - 5), np.abs(err).max()


def test_pfks_identity_function(keys_test):
    """pfpksk[k] implements f(x) = x: GLWE(m) from LWE(m)."""
    client, sks = keys_test
    p = client.params
    k = p.glwe_dimension
    bits = np.array([1, 0, 1])
    cts = client.encrypt_bits(bits)
    out = np.asarray(ks.pfks(jnp.asarray(cts), jnp.asarray(sks.pfpksk[:, :, k]), p))
    phase = _decrypt_glwe_phase(client, out)
    # constant coefficient should be ~ bit << 63; the rest ~ 0
    err0 = _signed(phase[..., 0] - (bits.astype(np.uint64) << np.uint64(63)))
    errs = _signed(phase[..., 1:])
    assert np.abs(err0).max() < 1 << 55
    assert np.abs(errs).max() < 1 << 55


def test_pfks_key_product_function(keys_test):
    """pfpksk[0] implements f(x) = -x·S_0: phase should be -(m<<63)·S_0."""
    client, sks = keys_test
    p = client.params
    bits = np.array([1])
    cts = client.encrypt_bits(bits)
    out = np.asarray(ks.pfks(jnp.asarray(cts), jnp.asarray(sks.pfpksk[:, :, 0]), p))
    phase = _decrypt_glwe_phase(client, out)[0]
    with np.errstate(over="ignore"):
        expect = np.uint64(0) - (client.glwe_sk[0] << np.uint64(63))
    err = _signed(phase - expect)
    assert np.abs(err).max() < 1 << 55


def test_prepared_keys_match_raw(keys_test_n256):
    """prepare_server_keys' int8 limb-plane keys produce bit-identical
    keyswitch / PBS / pfKS results to the raw u64 keys (pallas interpret)."""
    from tfhe_aes2_tpu.ops import keys as keys_mod

    client, sks = keys_test_n256
    p = client.params
    sks_j = __import__("jax").tree_util.tree_map(jnp.asarray, sks)

    # prepare_server_keys no-ops on CPU; build the prepared set directly
    from tfhe_aes2_tpu.ops.torus import split_u64_signed
    prepared = keys_mod.ServerKeySet(
        bsk=br.prepare_bsk(sks_j.bsk, p),
        ksk=split_u64_signed(sks_j.ksk),
        pfpksk=split_u64_signed(sks_j.pfpksk),
        pksk=sks_j.pksk)

    bits = np.array([0, 1, 1, 0])
    cts = jnp.asarray(client.encrypt_bits(bits))

    dual_raw = ks.keyswitch(cts, sks_j.ksk, p)
    dual_pre = ks.keyswitch(cts, prepared.ksk, p)
    np.testing.assert_array_equal(np.asarray(dual_pre), np.asarray(dual_raw))

    lwe_raw = br.pbs_bit_to_level(dual_raw, sks_j.bsk, p.cbs_base_log, p)
    # prepared int8 BSK forces the pallas kernel (interpret mode on CPU);
    # NOTE the test params DO activate plane truncation (sigma_bsk >= 32*74),
    # so the prepared key drops plane 0 while the raw CPU matmul path keeps
    # it: compare decoded bits, not raw phases
    lwe_pre = br.pbs_bit_to_level(dual_pre, prepared.bsk, p.cbs_base_log, p)
    ph_raw = client.decrypt_phase(np.asarray(lwe_raw))
    ph_pre = client.decrypt_phase(np.asarray(lwe_pre))
    dec_raw = ((ph_raw + np.uint64(1 << 62)) >> np.uint64(63)) & np.uint64(1)
    dec_pre = ((ph_pre + np.uint64(1 << 62)) >> np.uint64(63)) & np.uint64(1)
    np.testing.assert_array_equal(dec_pre, dec_raw)

    # with truncation disabled, the prepared-pallas and raw-matmul lowerings
    # are both exact mod 2^64 and must agree BIT-FOR-BIT
    import os
    os.environ["TFHE_BSK_TRUNC"] = "0"
    try:
        prepared0 = keys_mod.ServerKeySet(
            bsk=br.prepare_bsk(sks_j.bsk, p), ksk=prepared.ksk,
            pfpksk=prepared.pfpksk, pksk=sks_j.pksk)
        lwe_raw0 = br.pbs_bit_to_level(dual_raw, sks_j.bsk, p.cbs_base_log, p)
        lwe_pre0 = br.pbs_bit_to_level(dual_raw, prepared0.bsk,
                                       p.cbs_base_log, p)
        np.testing.assert_array_equal(np.asarray(lwe_pre0),
                                      np.asarray(lwe_raw0))
    finally:
        del os.environ["TFHE_BSK_TRUNC"]

    out_raw = ks.pfks_all(lwe_raw, sks_j.pfpksk, p)
    out_pre = ks.pfks_all(lwe_raw, prepared.pfpksk, p)
    np.testing.assert_array_equal(np.asarray(out_pre), np.asarray(out_raw))
