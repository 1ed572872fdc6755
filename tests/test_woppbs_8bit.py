"""8-bit model tests (mirror shortint_woppbs_8bit.rs:349-479)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_aes2_tpu.models import shortint_woppbs_8bit as m8
from tfhe_aes2_tpu.ops.params import PARAMS_TEST_8BIT


@pytest.fixture(scope="module")
def keys8():
    return m8.generate_keys(PARAMS_TEST_8BIT, seed=13)


def _encrypt_byte(client, ctx, byte: int):
    bits = np.array([(byte >> (7 - i)) & 1 for i in range(8)])
    return m8.fresh_linear_bitct(jnp.asarray(client.encrypt_bits_small(bits)), ctx)


def _decrypt_byte(client, bits_ct) -> int:
    bits = client.decrypt_bits_small(np.asarray(bits_ct.array))
    return int(np.packbits(bits.astype(np.uint8))[0])


def test_bit_small_key_xor(keys8):
    client, ctx = keys8
    b1 = _encrypt_byte(client, ctx, 0b10110101)
    b2 = _encrypt_byte(client, ctx, 0b01100110)
    out = b1 ^ b2
    assert _decrypt_byte(client, out) == 0b10110101 ^ 0b01100110


def test_bootstrap_from_bits_identity(keys8):
    client, ctx = keys8
    byte = 0b10110101
    bct = _encrypt_byte(client, ctx, byte)
    lut = ctx.generate_lookup_table(lambda v: v)
    fw = ctx.bootstrap_from_bits(bct, lut)
    # decrypt the full-width ct at delta 2^56
    phase = client.decrypt_phase(np.asarray(fw.array))
    val = int((phase + np.uint64(1 << 55)) >> np.uint64(56)) & 0xFF
    assert val == byte


def test_bootstrap_from_bits_plus3(keys8):
    client, ctx = keys8
    byte = 0b10110101
    bct = _encrypt_byte(client, ctx, byte)
    lut = ctx.generate_lookup_table(lambda v: v + 3)
    fw = ctx.bootstrap_from_bits(bct, lut)
    phase = client.decrypt_phase(np.asarray(fw.array))
    val = int((phase + np.uint64(1 << 55)) >> np.uint64(56)) & 0xFF
    assert val == (byte + 3) % 256


def test_extract_bits_roundtrip(keys8):
    """encrypt int byte -> extract bits -> decrypt = byte
    (shortint_woppbs_8bit.rs:464-478)."""
    client, ctx = keys8
    byte = 0b10110101
    enc = np.uint64(byte) << np.uint64(56)
    fw = m8.FullWidthCt(jnp.asarray(client.encrypt_encodings_big(
        np.array([enc], dtype=np.uint64))), ctx)
    bits_ct = ctx.extract_bits_from_ciphertext(
        m8.FullWidthCt(fw.array[0], ctx))
    bits = client.decrypt_bits_small(np.asarray(bits_ct.array))
    assert int(np.packbits(bits.astype(np.uint8))[0]) == byte


def test_light_aes_8bit_model(keys8):
    """2-round AES with clear key schedule on the 8-bit model (the reference's
    ShortintWoppbs8BitSboxPbsAesEncrypt binding)."""
    from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod, plain

    client, ctx = keys8
    rng = np.random.default_rng(21)
    key = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
    blocks = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()]

    def enc_bits(data):
        arr = np.unpackbits(np.asarray(data, np.uint8)[..., None], axis=-1)
        return client.encrypt_bits_small(arr)

    ks_clear = plain.key_schedule(key)
    eks = m8.fresh_linear_bitct(jnp.asarray(enc_bits(ks_clear)), ctx)
    blk = m8.fresh_linear_bitct(
        jnp.asarray(enc_bits(np.frombuffer(blocks[0], np.uint8)[None])), ctx)

    strategy = fhe_mod.ShortintWoppbs8BitSboxPbsAesEncrypt
    out = fhe_mod.encrypt_blocks_eager(strategy, ctx, eks, blk.array, 2)

    bits = client.decrypt_bits_small(np.asarray(out.array)).astype(np.uint8)
    got = np.packbits(bits, axis=-1)[..., 0].tobytes()
    expect = plain.expand_key_and_encrypt_blocks(key, blocks, 2)[0]
    assert got == expect


def test_bootstrap_then_extract_sbox(keys8):
    """The AES byte op: bootstrap through an SBOX LUT then re-extract bits
    (fhe_impls/shortint_woppbs_8bit.rs:26-42)."""
    from tfhe_aes2_tpu.aes_128 import SBOX
    client, ctx = keys8
    byte = 0x53
    bct = _encrypt_byte(client, ctx, byte)
    lut = ctx.generate_lookup_table(lambda v: int(SBOX[v]))
    fw = ctx.bootstrap_from_bits(bct, lut)
    out_bits = ctx.extract_bits_from_ciphertext(fw)
    assert _decrypt_byte(client, out_bits) == int(SBOX[byte])
