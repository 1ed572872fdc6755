"""Key serialization round-trip tests."""

import numpy as np

from tfhe_aes2_tpu.ops import serialization as ser


def test_server_key_roundtrip(tmp_path, keys_test):
    client, sks = keys_test
    path = str(tmp_path / "server_keys.npz")
    ser.save_server_keys(path, sks, client.params)
    sks2, params2 = ser.load_server_keys(path)
    assert params2 == client.params
    np.testing.assert_array_equal(sks2.bsk, sks.bsk)
    np.testing.assert_array_equal(sks2.ksk, sks.ksk)
    np.testing.assert_array_equal(sks2.pfpksk, sks.pfpksk)
    np.testing.assert_array_equal(sks2.pksk, sks.pksk)


def test_client_key_roundtrip(tmp_path, keys_test):
    client, _ = keys_test
    path = str(tmp_path / "client_key.npz")
    ser.save_client_key(path, client)
    client2 = ser.load_client_key(path)
    np.testing.assert_array_equal(client2.lwe_sk, client.lwe_sk)
    np.testing.assert_array_equal(client2.glwe_sk, client.glwe_sk)
    # the restored client decrypts ciphertexts made by the original
    bits = np.array([1, 0, 1, 1])
    cts = client.encrypt_bits(bits)
    np.testing.assert_array_equal(client2.decrypt_bits(cts), bits)
