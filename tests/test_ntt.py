"""CRT-NTT vertical-packing external product (ops/ntt.py).

Pins bit-exactness of the shared-matrix transform lowering against the
negacirculant reference paths at production-like geometry (N=512, k+1=5
rows/components, js=4 dropped planes, 12-bit digits — the worst-case bound
the prime product covers)."""

import numpy as np
import jax
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import ntt, polynomial
from tfhe_aes2_tpu.ops.torus import split_u64_signed


def test_ntt_matches_negacirculant_production_shape():
    rng = np.random.default_rng(7)
    b, g, r, o, n, js = 2, 3, 5, 5, 512, 4

    digits = rng.integers(-(1 << 12), (1 << 12) + 1, (b, g, r, n)
                          ).astype(np.int32)
    ext = rng.integers(0, 1 << 64, (b, o, r, n), dtype=np.uint64)

    # planes layout the VP path feeds: [8-js, B, R, O, 2N]
    from tfhe_aes2_tpu.ops.polynomial import negacyclic_extend
    ext2 = np.asarray(negacyclic_extend(jnp.asarray(ext)))   # [B, O, R, 2N]
    planes = np.asarray(split_u64_signed(jnp.asarray(ext2)))  # [8, B, O, R, 2N]
    planes = np.transpose(planes, (0, 1, 3, 2, 4))[js:]       # [4, B, R, O, 2N]

    got = np.asarray(ntt.polymul_digits_ntt_grouped(
        jnp.asarray(digits), jnp.asarray(planes), 1 << 12, j_start=js))

    # reference: truncated-ext negacyclic products summed over r, mod 2^64
    from tfhe_aes2_tpu.ops import truncation
    ext_t = np.asarray(truncation.truncate_u64_values(jnp.asarray(ext), js))
    expect = np.zeros((b, g, o, n), np.uint64)
    for bi in range(b):
        for gi in range(g):
            for oi in range(o):
                acc = np.zeros(n, np.uint64)
                for ri in range(r):
                    d = digits[bi, gi, ri].astype(np.int64)
                    e = ext_t[bi, oi, ri]
                    # schoolbook negacyclic conv mod 2^64
                    for j in range(n):
                        dj = np.uint64(int(d[j]) & ((1 << 64) - 1))
                        rolled = np.concatenate([e[n - j:], e[:n - j]]) \
                            if j else e
                        sign = np.ones(n, np.uint64)
                        if j:
                            sign[:j] = np.uint64((1 << 64) - 1)
                        # (-1) factor via two's complement multiply
                        acc = acc + dj * rolled * sign
                expect[bi, gi, oi] = acc

    assert np.array_equal(got, expect)


def test_ntt_barrett_and_garner_edges():
    """Barrett exactness at the +-2^28 extremes and Garner reconstruction
    of values near +-P/2."""
    for p in ntt.PRIMES:
        xs = jnp.asarray([(1 << 28) - 1, -(1 << 28) + 1, 0, p, -p,
                          p // 2, -(p // 2), 123456789], jnp.int32)
        r = np.asarray(ntt._barrett(xs, p)).astype(np.int64)
        assert ((r - np.asarray(xs, np.int64)) % p == 0).all()
        assert (np.abs(r) <= p // 2 + 1).all()

    p1, p2, p3, p4 = ntt.PRIMES
    big = p1 * p2 * p3 * p4
    for v in (0, 1, -1, big // 2 - 1, -(big // 2) + 1, 10**15, -(10**15)):
        res = [jnp.asarray([v % p if v % p <= p // 2 else v % p - p],
                           jnp.int32) for p in ntt.PRIMES]
        got = int(np.asarray(ntt._garner_u64(res, ntt.PRIMES))[0])
        assert got == v % (1 << 64), (v, got)
