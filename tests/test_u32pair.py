"""Native u32-pair arithmetic vs the u64 reference ops."""

import numpy as np
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import decomposition, polynomial, u32pair as up


def _rand_u64(rng, shape):
    return rng.integers(0, 1 << 64, shape, dtype=np.uint64)


def test_roundtrip_add_sub_neg():
    rng = np.random.default_rng(41)
    a = _rand_u64(rng, 64)
    b = _rand_u64(rng, 64)
    pa, pb = up.from_u64(jnp.asarray(a)), up.from_u64(jnp.asarray(b))
    with np.errstate(over="ignore"):
        np.testing.assert_array_equal(np.asarray(up.to_u64(*pa)), a)
        np.testing.assert_array_equal(np.asarray(up.to_u64(*up.add(pa, pb))), a + b)
        np.testing.assert_array_equal(np.asarray(up.to_u64(*up.sub(pa, pb))), a - b)
        np.testing.assert_array_equal(np.asarray(up.to_u64(*up.neg(pa))),
                                      np.uint64(0) - a)


def test_monomial_mul_pair():
    rng = np.random.default_rng(42)
    n = 16
    p = _rand_u64(rng, (3, n))
    t = np.array([0, 5, 2 * n - 1], dtype=np.int32)
    expect = np.asarray(polynomial.monomial_mul(jnp.asarray(p), jnp.asarray(t)))
    got = np.asarray(up.to_u64(*up.monomial_mul(up.from_u64(jnp.asarray(p)),
                                                jnp.asarray(t), n)))
    np.testing.assert_array_equal(got, expect)


def test_decompose_pair():
    rng = np.random.default_rng(43)
    xs = np.concatenate([
        _rand_u64(rng, 200),
        np.array([0, 1, (1 << 64) - 1, 1 << 63, 0x8000000000000123], np.uint64)])
    for b, l in [(12, 3), (15, 2), (3, 4), (6, 7), (2, 6), (24, 1), (9, 4)]:
        expect = np.asarray(decomposition.decompose(jnp.asarray(xs), b, l))
        got = np.asarray(up.decompose(up.from_u64(jnp.asarray(xs)), b, l))
        np.testing.assert_array_equal(got, expect, err_msg=f"b={b} l={l}")


def test_accumulate_partials():
    rng = np.random.default_rng(44)
    partials = {s: jnp.asarray(rng.integers(-2**30, 2**30, 32, dtype=np.int32))
                for s in range(8)}
    got = np.asarray(up.to_u64(*up.accumulate_partials(partials)))
    expect = np.zeros(32, np.uint64)
    with np.errstate(over="ignore"):
        for s, v in partials.items():
            expect += (np.asarray(v).astype(np.int64).astype(np.uint64)
                       << np.uint64(8 * s))
    np.testing.assert_array_equal(got, expect)


def test_static_rot_pair():
    rng = np.random.default_rng(44)
    n = 16
    p = _rand_u64(rng, (3, 2, n))
    for t in [0, 1, 5, n - 1, n, n + 3, 2 * n - 1]:
        expect = np.asarray(polynomial.monomial_mul_static(jnp.asarray(p), t))
        got = np.asarray(up.to_u64(*up.static_rot(up.from_u64(jnp.asarray(p)),
                                                  t, n)))
        np.testing.assert_array_equal(got, expect, err_msg=f"t={t}")
