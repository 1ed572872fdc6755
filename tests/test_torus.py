"""Exact limb arithmetic tests (ops/torus.py)."""

import numpy as np
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import torus


def test_encode_decode_bit():
    # mirrors reference shortint_woppbs_1bit.rs:447-461
    assert int(torus.encode_bit(0)) == 0
    assert int(torus.encode_bit(1)) == 1 << 63
    for enc, expect in [(0, 0), (1, 0), (2**64 - 1, 0), (1 << 63, 1),
                        ((1 << 63) - 1, 1), ((1 << 63) + 1, 1)]:
        assert int(torus.decode_bit(jnp.uint64(enc))) == expect


def test_split_u64_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 64, 64, dtype=np.uint64)
    planes = np.asarray(torus.split_u64_signed(jnp.asarray(x)))
    assert planes.min() >= -128 and planes.max() < 128
    recon = np.zeros_like(x)
    with np.errstate(over="ignore"):
        for i in range(8):
            recon += planes[i].astype(np.int64).astype(np.uint64) << np.uint64(8 * i)
    np.testing.assert_array_equal(recon, x)


def test_split_int32_roundtrip():
    rng = np.random.default_rng(2)
    for n_limbs, bound in [(1, 100), (2, 1 << 14), (3, 1 << 22)]:
        d = rng.integers(-bound, bound + 1, 100, dtype=np.int32)
        planes = np.asarray(torus.split_int32_signed(jnp.asarray(d), n_limbs))
        assert planes.min() >= -128 and planes.max() < 128
        recon = sum(planes[i].astype(np.int64) << (8 * i) for i in range(n_limbs))
        np.testing.assert_array_equal(recon, d.astype(np.int64))


def test_exact_matmul_i8_path_matches_python_ints():
    """The TPU int8 limb-plane lowering, exercised explicitly on CPU."""
    from tfhe_aes2_tpu.ops.torus import _exact_matmul_i8
    rng = np.random.default_rng(9)
    b_, k_, o_ = 3, 29, 7
    bound = 1 << 14
    d = rng.integers(-bound, bound + 1, (b_, k_), dtype=np.int32)
    m = rng.integers(0, 1 << 64, (k_, o_), dtype=np.uint64)
    out = np.asarray(_exact_matmul_i8(jnp.asarray(d), jnp.asarray(m), bound,
                                      "bk,ko->bo", k_))
    for b in range(b_):
        for o in range(o_):
            acc = sum(int(d[b, kk]) * int(m[kk, o]) for kk in range(k_))
            assert int(out[b, o]) == acc % (1 << 64)


def test_exact_matmul_matches_python_ints():
    rng = np.random.default_rng(3)
    b_, k_, o_ = 5, 37, 11
    bound = 1 << 14
    d = rng.integers(-bound, bound + 1, (b_, k_), dtype=np.int32)
    m = rng.integers(0, 1 << 64, (k_, o_), dtype=np.uint64)
    out = np.asarray(torus.exact_matmul(jnp.asarray(d), jnp.asarray(m), bound,
                                        max_k=k_))
    # python big-int reference
    expect = np.zeros((b_, o_), dtype=np.uint64)
    for b in range(b_):
        for o in range(o_):
            acc = sum(int(d[b, kk]) * int(m[kk, o]) for kk in range(k_))
            expect[b, o] = np.uint64(acc % (1 << 64))
    np.testing.assert_array_equal(out, expect)
