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
