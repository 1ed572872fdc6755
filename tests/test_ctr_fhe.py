"""Server-side FHE CTR counter (aes_128/ctr_fhe.py): the serving-mode
promotion of the reference's test-only increment adder
(shortint_woppbs_1bit.rs:833-877) — derive iv‖ctr blocks homomorphically
from ONE uploaded block, then run AES over the derived batch."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_aes2_tpu.aes_128 import ctr_fhe, fhe as fhe_mod, fhe_encryption, plain
from tfhe_aes2_tpu.aes_128.scenario import ctr_blocks
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext


def _ctx(keys):
    client, sks = keys
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    return client, FheContext(params=client.params, sks=sks_dev)


def test_derive_ctr_blocks(keys_test_n256):
    """Counter half (bytes 8..15, big-endian) increments across a byte
    boundary; the IV half passes through untouched."""
    client, ctx = _ctx(keys_test_n256)
    iv = bytes.fromhex("bdd219b8a08ded1a")
    block0 = iv + (255).to_bytes(8, "big")
    block0_ct = fhe_encryption.encrypt_blocks(client, [block0])[0]

    derived = ctr_fhe.derive_ctr_blocks(ctx, block0_ct, 3)
    got = fhe_encryption.decrypt_blocks(client, np.asarray(derived))
    assert got == [iv + c.to_bytes(8, "big") for c in (255, 256, 257)]


def test_derive_ctr_blocks_staged_wraps(keys_test_n256):
    """The staged (one-program-per-increment) path agrees, and the carry out
    of the top counter byte is dropped (u64 wrap, like main.rs's counter)."""
    client, ctx = _ctx(keys_test_n256)
    iv = bytes(8)
    block0 = iv + ((1 << 64) - 1).to_bytes(8, "big")
    block0_ct = fhe_encryption.encrypt_blocks(client, [block0])[0]

    derived = ctr_fhe.derive_ctr_blocks_staged(ctx, jnp.asarray(block0_ct), 2)
    got = fhe_encryption.decrypt_blocks(client, np.asarray(derived))
    assert got == [block0, iv + bytes(8)]  # wraps to 0


def test_aes_light_on_derived_blocks(keys_test_n256):
    """test_light-style end-to-end: 2 AES rounds (clear key schedule) over a
    server-derived CTR batch, vs the partial-round plain oracle."""
    client, ctx = _ctx(keys_test_n256)
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    iv = bytes.fromhex("bdd219b8a08ded1a")
    blocks_clear = ctr_blocks(iv, 2)
    block0_ct = fhe_encryption.encrypt_blocks(client, blocks_clear[:1])[0]

    blocks_arr = ctr_fhe.derive_ctr_blocks_staged(ctx, jnp.asarray(block0_ct), 2)
    ks_ct = fhe_encryption.encrypt_word_array(client, plain.key_schedule(key))
    fn = fhe_mod.make_encrypt_blocks_fn(
        fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt, client.params, 2)
    out = np.asarray(fn(ctx.sks, jnp.asarray(ks_ct), blocks_arr))
    got = fhe_encryption.decrypt_blocks(client, out)
    assert got == plain.expand_key_and_encrypt_blocks(key, blocks_clear, 2)


@pytest.mark.slow
def test_cli_fhe_counter_scenario():
    """The user-facing path: CLI --fhe-counter through the full scenario
    (FHE key schedule + server-derived keystream), vs the plain oracle."""
    from tfhe_aes2_tpu import cli
    rc = cli.main(["--key", "76b8e0ada0f13d90405d6ae55386bd28",
                   "--iv", "bdd219b8a08ded1a", "--number-of-outputs", "2",
                   "--params", "test", "--rounds", "2", "--fhe-counter"])
    assert rc == 0
