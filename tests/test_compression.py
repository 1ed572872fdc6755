"""Output ciphertext compression (ops/compression.py): keyswitch-to-small +
modulus switch for transport — correctness at both supported moduli and
through the full client/server scenario."""

import numpy as np
import jax.numpy as jnp
import pytest

from tfhe_aes2_tpu.ops import compression


@pytest.mark.parametrize("log2q", [16, 32])
def test_compress_roundtrip(keys_test, log2q):
    client, sks = keys_test
    rng = np.random.default_rng(23)
    bits = rng.integers(0, 2, 64)
    big = jnp.asarray(client.encrypt_bits(bits))

    comp = compression.compress_bits(big, sks, client.params, log2q)
    assert comp.dtype == (jnp.uint16 if log2q <= 16 else jnp.uint32)
    got = compression.decrypt_bits_compressed(client, np.asarray(comp), log2q)
    np.testing.assert_array_equal(got, bits)

    # serialization roundtrip at the wire width
    blob = compression.pack_bytes(np.asarray(comp), log2q)
    words = 2 if log2q <= 16 else 4
    assert len(blob) == comp.size * words
    back = compression.unpack_bytes(blob, comp.shape, log2q)
    np.testing.assert_array_equal(
        compression.decrypt_bits_compressed(client, back, log2q), bits)


def test_scenario_with_compressed_output(keys_test):
    """1-block 1-round scenario with a 16-bit compressed response; the
    scenario verifies the decrypted keystream against the plain oracle."""
    from tfhe_aes2_tpu.aes_128.scenario import run_client_server_aes_scenario
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext

    client, sks = keys_test
    ctx = FheContext(params=client.params,
                     sks=__import__("jax").tree_util.tree_map(
                         jnp.asarray, sks))
    run_client_server_aes_scenario(
        client, ctx, bytes(range(16)), bytes(8), 1, rounds=1,
        compress_log2q=16)
