"""Clear AES oracle tests (mirrors reference plain.rs:157-172 + FIPS-197)."""

import numpy as np

from tfhe_aes2_tpu.aes_128 import ROUNDS, gf_256_mul, plain
from tfhe_aes2_tpu.aes_128 import aes_lib


def test_fips_197_c1():
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ks = plain.key_schedule(key)
    ct = plain.encrypt_block(ks, pt, ROUNDS)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_fips_197_a1_key_schedule():
    # FIPS-197 appendix A.1 expansion of 2b7e151628aed2a6abf7158809cf4f3c
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    ks = plain.key_schedule(key)
    assert bytes(ks[4]).hex() == "a0fafe17"
    assert bytes(ks[43]).hex() == "b6630ca6"


def test_plain_vs_aes_lib():
    rng = np.random.default_rng(0)
    key = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
    blocks = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes() for _ in range(4)]
    ours = plain.expand_key_and_encrypt_blocks(key, blocks)
    theirs = aes_lib.encrypt_blocks(key, blocks)
    assert ours == theirs


def test_gf_256_mul():
    # classic example 0x57 * 0x83 = 0xc1 (FIPS-197 §4.2)
    assert gf_256_mul(0x57, 0x83) == 0xC1
    assert gf_256_mul(0x57, 2) == 0xAE
    assert gf_256_mul(0x57, 3) == 0xAE ^ 0x57
