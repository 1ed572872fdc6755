"""LWE encrypt/decrypt/XOR tests (mirrors shortint_woppbs_1bit.rs:463-503)."""

import numpy as np
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import lwe


def test_encrypt_decrypt(keys_test):
    client, _ = keys_test
    bits = np.array([0, 1, 1, 0, 1, 0])
    cts = client.encrypt_bits(bits)
    np.testing.assert_array_equal(client.decrypt_bits(cts), bits)


def test_trivial(keys_test):
    client, _ = keys_test
    dim = client.params.big_lwe_dimension
    cts = np.asarray(lwe.trivial_bits(jnp.asarray([0, 1]), dim))
    np.testing.assert_array_equal(client.decrypt_bits(cts), [0, 1])


def test_xor_truth_table(keys_test):
    client, _ = keys_test
    a = np.array([0, 0, 1, 1])
    b = np.array([0, 1, 0, 1])
    ca, cb = client.encrypt_bits(a), client.encrypt_bits(b)
    out = np.asarray(lwe.add(jnp.asarray(ca), jnp.asarray(cb)))
    np.testing.assert_array_equal(client.decrypt_bits(out), a ^ b)


def test_xor_with_trivial(keys_test):
    client, _ = keys_test
    dim = client.params.big_lwe_dimension
    b1 = client.encrypt_bits(np.array([1]))
    t0 = np.asarray(lwe.trivial_bits(jnp.asarray([0]), dim))
    out = np.asarray(lwe.add(jnp.asarray(b1), jnp.asarray(t0)))
    np.testing.assert_array_equal(client.decrypt_bits(out), [1])
