"""Circuit bootstrap + vertical packing tests.

Mirrors the reference's multivariate/multivalued LUT tests
(shortint_woppbs_1bit.rs:531-697): parity functions, square functions, the
16->8-bit XOR, identity bootstraps, and the pure LUT-layout tests.
"""

import numpy as np
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs
from tfhe_aes2_tpu.utils import bits as bitutil


def _encrypt_value_bits(client, value: int, t: int):
    """value -> t LWE bit cts, MSB first: [t, kN+1]."""
    bits = np.array([(value >> (t - 1 - i)) & 1 for i in range(t)])
    return client.encrypt_bits(bits), bits


_JIT_CACHE = {}


def _run_lut(client, sks, value: int, t: int, o: int, f):
    import jax

    p = client.params
    cts, _ = _encrypt_value_bits(client, value, t)
    lut = cbs.generate_lut(t, o, f, p)
    key = (id(sks), t, o)
    if key not in _JIT_CACHE:
        sks_j = jax.tree_util.tree_map(jnp.asarray, sks)
        _JIT_CACHE[key] = jax.jit(
            lambda c, l: cbs.circuit_bootstrap_vertical_packing(c, l, sks_j, p))
    out = np.asarray(_JIT_CACHE[key](jnp.asarray(cts), jnp.asarray(lut)))
    out_bits = client.decrypt_bits(out)
    return sum(int(b) << (o - 1 - i) for i, b in enumerate(out_bits))


def test_lut_layout_vertical_packing(keys_test):
    # mirrors shortint_woppbs_1bit.rs:665-677 (PolynomialSize(16), 3->2 bits)
    client, _ = keys_test
    from tfhe_aes2_tpu.ops.params import WopbsParams
    import dataclasses
    p16 = dataclasses.replace(client.params, polynomial_size=16)
    lut = cbs.generate_lut(3, 2, lambda v: v, p16)
    assert lut.shape == (2, 1, 16)
    e = np.uint64(1 << 63)
    np.testing.assert_array_equal(
        lut[0, 0], np.array([0, 0, e, e, 0, 0, e, e, 0, 0, 0, 0, 0, 0, 0, 0],
                            dtype=np.uint64))
    np.testing.assert_array_equal(
        lut[1, 0], np.array([0, e, 0, e, 0, e, 0, e, 0, 0, 0, 0, 0, 0, 0, 0],
                            dtype=np.uint64))


def test_lut_layout_multipolynomial(keys_test):
    # mirrors shortint_woppbs_1bit.rs:679-697 (PolynomialSize(8), 5->2 bits)
    client, _ = keys_test
    import dataclasses
    p8 = dataclasses.replace(client.params, polynomial_size=8)
    lut = cbs.generate_lut(5, 2, lambda v: v, p8)
    assert lut.shape == (2, 4, 8)
    flat = lut.reshape(2, 32)
    e = np.uint64(1 << 63)
    np.testing.assert_array_equal(flat[0], np.tile([0, 0, e, e], 8))
    np.testing.assert_array_equal(flat[1], np.tile([0, e], 16))


def test_identity_bootstrap(keys_test):
    client, sks = keys_test
    for bit in (0, 1):
        assert _run_lut(client, sks, bit, 1, 1, lambda v: v) == bit


def test_parity_fn_3(keys_test):
    client, sks = keys_test
    parity = lambda v: bin(v).count("1") % 2
    for word in (0b001, 0b000, 0b100, 0b101):
        assert _run_lut(client, sks, word, 3, 1, parity) == parity(word)


def test_square_fn_3(keys_test):
    client, sks = keys_test
    sq = lambda v: (v * v) % 8
    for word in (0b101, 0b000, 0b100, 0b011):
        assert _run_lut(client, sks, word, 3, 3, sq) == sq(word)


def test_parity_fn_8_with_tree(keys_test):
    """8 input bits with N=64 -> a 2-level CMux tree."""
    client, sks = keys_test
    parity = lambda v: bin(v).count("1") % 2
    for word in (0b11001001, 0b01001001, 0b00101010, 0b11011001):
        assert _run_lut(client, sks, word, 8, 1, parity) == parity(word)


def test_square_fn_8_with_tree(keys_test):
    client, sks = keys_test
    sq = lambda v: (v * v) % 256
    word = 0b11001001
    assert _run_lut(client, sks, word, 8, 8, sq) == sq(word)


def test_square_fn_8_no_tree(keys_test_n256):
    """8 input bits with N=256 -> pure rotation stage (production geometry)."""
    client, sks = keys_test_n256
    sq = lambda v: (v * v) % 256
    for word in (0b11001001, 0b00101010):
        assert _run_lut(client, sks, word, 8, 8, sq) == sq(word)


def test_xor_16bit(keys_test_n256):
    """16->8-bit XOR (mirrors shortint_woppbs_1bit.rs:627-659)."""
    client, sks = keys_test_n256
    xor_fn = lambda v: ((v >> 8) ^ (v & 0xFF)) & 0xFF
    word = (0b11000110 << 8) | 0b10101010
    assert _run_lut(client, sks, word, 16, 8, xor_fn) == xor_fn(word)


def test_vertical_packing_pallas_mode_matches_matmul(keys_test, monkeypatch):
    """Force the grouped Pallas VP path (interpret mode on CPU) against the
    default matmul path on a full 8->4 LUT evaluation.

    Bit-exactness requires the noise-floor GGSW truncation off (it is a
    deliberate deviation; tests/test_truncation.py pins the truncated path's
    semantics and decode correctness)."""
    import jax

    monkeypatch.setenv("TFHE_VP_TRUNC", "0")
    client, sks = keys_test
    p = client.params
    value = 0xA7
    cts, _ = _encrypt_value_bits(client, value, 8)
    lut = cbs.generate_lut(8, 4, lambda v: (v * 131) & 0xF, p)
    sks_j = jax.tree_util.tree_map(jnp.asarray, sks)
    ggsw = cbs.circuit_bootstrap_bits(jnp.asarray(cts), sks_j, p)
    out_mm = np.asarray(cbs.vertical_packing(
        ggsw, jnp.asarray(lut), p, use_conv="matmul"))
    out_pl = np.asarray(cbs.vertical_packing(
        ggsw, jnp.asarray(lut), p, use_conv="pallas"))
    np.testing.assert_array_equal(out_pl, out_mm)
    got = client.decrypt_bits(out_pl)
    expect = (value * 131) & 0xF
    assert sum(int(b) << (3 - i) for i, b in enumerate(got)) == expect


def test_vertical_packing_pair_glue_matches_u64_glue(keys_test, monkeypatch):
    """The u32-pair stage loop (TFHE_VP_PAIR, default) against the u64 XLA
    glue with the SAME pallas kernel — must be bit-exact including the active
    noise-floor GGSW truncation (both paths drop the same planes)."""
    import jax

    client, sks = keys_test
    p = client.params
    cts, _ = _encrypt_value_bits(client, 0x5C, 8)
    lut = cbs.generate_lut(8, 4, lambda v: (v ^ (v >> 3)) & 0xF, p)
    sks_j = jax.tree_util.tree_map(jnp.asarray, sks)
    ggsw = cbs.circuit_bootstrap_bits(jnp.asarray(cts), sks_j, p)
    monkeypatch.setenv("TFHE_VP_PAIR", "0")
    out_u64 = np.asarray(cbs.vertical_packing(
        ggsw, jnp.asarray(lut), p, use_conv="pallas"))
    monkeypatch.setenv("TFHE_VP_PAIR", "1")
    out_pair = np.asarray(cbs.vertical_packing(
        ggsw, jnp.asarray(lut), p, use_conv="pallas"))
    np.testing.assert_array_equal(out_pair, out_u64)
