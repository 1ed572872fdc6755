"""Native C++ client core vs the Python implementations."""

import numpy as np
import jax.numpy as jnp
import pytest

native = pytest.importorskip("tfhe_aes2_tpu.native")

try:
    native.lib()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native build failed")


def test_negacyclic_mul_matches_python():
    from tfhe_aes2_tpu.ops import polynomial
    rng = np.random.default_rng(31)
    n = 64
    a = rng.integers(0, 1 << 10, n, dtype=np.uint64)
    b = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    got = native.negacyclic_mul(a, b)
    expect = np.asarray(polynomial.polymul_digits_shared(
        jnp.asarray(a.astype(np.int32))[None, None, :],
        jnp.asarray(b)[None, None, :], 1 << 10))[0, 0]
    np.testing.assert_array_equal(got, expect)


def test_decompose_matches_python():
    from tfhe_aes2_tpu.ops import decomposition
    rng = np.random.default_rng(32)
    xs = rng.integers(0, 1 << 64, 64, dtype=np.uint64)
    for base_log, levels in [(12, 3), (15, 2), (3, 4)]:
        got = native.decompose(xs, base_log, levels)
        expect = np.asarray(decomposition.decompose(jnp.asarray(xs), base_log, levels))
        np.testing.assert_array_equal(got, expect)


def test_native_lwe_roundtrip():
    rng = native.NativeRng(seed=99)
    n = 128
    sk = rng.uniform_u64(n) & np.uint64(1)
    bits = np.array([0, 1, 1, 0, 1], np.uint64)
    msgs = bits << np.uint64(63)
    cts = rng.lwe_encrypt(sk, msgs, 2.0 ** -25)
    phase = native.lwe_decrypt_phase(sk, cts)
    decoded = ((phase + np.uint64(1 << 62)) >> np.uint64(63)) & np.uint64(1)
    np.testing.assert_array_equal(decoded, bits)


def test_native_rng_deterministic():
    a = native.NativeRng(seed=5).uniform_u64(8)
    b = native.NativeRng(seed=5).uniform_u64(8)
    c = native.NativeRng(seed=6).uniform_u64(8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_native_gaussian_std():
    g = native.NativeRng(seed=7).gaussian_u64(200_000, 2.0 ** -20).astype(np.int64)
    std = g.std()
    expect = 2.0 ** 44
    assert 0.98 * expect < std < 1.02 * expect
