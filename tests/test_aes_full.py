"""Full 10-round FHE AES with FHE key expansion (test_full equivalent,
test_helper.rs:13-84). Slower (~2 min CPU) — the FIPS-197 C.1 authority test.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_aes2_tpu.aes_128 import aes_lib, fhe as fhe_mod, fhe_encryption
from tfhe_aes2_tpu.aes_128.scenario import ctr_blocks


@pytest.mark.slow
def test_full_gal_mul_fips_197(keys_test_n256):
    client, sks = keys_test_n256
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    blocks = [bytes.fromhex("00112233445566778899aabbccddeeff")]
    key_ct = fhe_encryption.encrypt_byte_array(client, key)
    block_cts = fhe_encryption.encrypt_blocks(client, blocks)
    fn = fhe_mod.make_full_aes_fn(
        fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt, client.params, 10)
    out = np.asarray(fn(sks_dev, jnp.asarray(key_ct), jnp.asarray(block_cts)))
    got = fhe_encryption.decrypt_blocks(client, out)
    assert got[0].hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_ctr_blocks_layout():
    iv = bytes.fromhex("bdd219b8a08ded1a")
    blocks = ctr_blocks(iv, 3)
    assert blocks[0] == iv + (1).to_bytes(8, "big")
    assert blocks[2] == iv + (3).to_bytes(8, "big")


def test_ctr_scenario_vs_aes_lib():
    """CTR keystream layout matches the reference scenario (clear check)."""
    key = bytes.fromhex("76b8e0ada0f13d90405d6ae55386bd28")
    iv = bytes.fromhex("bdd219b8a08ded1a")
    blocks = ctr_blocks(iv, 2)
    out = aes_lib.encrypt_blocks(key, blocks)
    from tfhe_aes2_tpu.aes_128 import plain
    assert out == plain.expand_key_and_encrypt_blocks(key, blocks, 10)
