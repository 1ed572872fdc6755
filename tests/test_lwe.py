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


def test_degree_metadata(keys_test):
    """Ciphertext `Degree` bound parity (the reference's wrap_in_shortint
    sets Degree on every ct it hands to shortint,
    shortint_woppbs_1bit.rs:405-417): literal value on trivials, 1 on fresh/
    bootstrapped bits, saturating under XOR, carried through lane ops."""
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import (
        FheContext, fresh_bitct)

    client, _ = keys_test
    ctx = FheContext(params=client.params, sks=None, meta_only=True)

    t = ctx.trivial_bits(np.array([0, 1]))
    np.testing.assert_array_equal(t.degree, [0, 1])

    dim = client.params.big_lwe_dimension
    f = fresh_bitct(jnp.zeros((2, dim + 1), jnp.uint64), ctx)
    np.testing.assert_array_equal(f.degree, [1, 1])

    np.testing.assert_array_equal((f ^ t).degree, [1, 1])     # saturates at 1
    z = ctx.trivial_bits(np.array([0, 0]))
    np.testing.assert_array_equal((z ^ t).degree, [0, 1])

    np.testing.assert_array_equal(
        t.take_lanes(np.array([1, 0]), 0).degree, [1, 0])
    np.testing.assert_array_equal(t.slice_lanes(slice(1, 2), 0).degree, [1])
    both = type(t).concat_lanes([z, t], axis=0)
    np.testing.assert_array_equal(both.degree, [0, 0, 0, 1])

    # bootstrap outputs carry the LUT-output bound (1 per bit lane)
    lut = ctx.generate_lookup_table(1, 1, lambda b: b)
    booted = ctx.circuit_bootstrap(f.reshape_lanes(2, 1), lut)
    np.testing.assert_array_equal(booted.degree, [[1], [1]])
