"""Exact negacyclic NTT external product for vertical packing (XLA-level).

The VP stage's per-lane GGSW selectors defeat the shared-negacirculant MXU
design of the blind-rotate kernel: the fused pallas VP kernel spends ~80% of
its time materializing per-poly negacirculant ladders in VMEM (PERF.md).
This module replaces the ladders with transforms against SHARED constant
matrices — pure MXU work — over four 14-bit CRT primes:

    forward   X_p = x @ W_p (mod p)      W_p[j, m] = psi^j omega^{jm}
              (the negacyclic twist psi folds into the constant matrix)
    weights   Ê_p = Σ_j (2^{8j} mod p) · Ê_{j,p}   — the ext limb planes
              combine IN FREQUENCY, so pointwise and inverse run once per
              prime instead of once per (dig-plane × ext-plane) pair
    pointwise P_p[b,g,o,m] = Σ_r D_p[b,g,r,m] · E_p[b,o,r,m]  (mod p)
    inverse   out_p = P_p @ Winv_p (mod p); CRT-4 (Garner) -> signed integer
              -> wrap mod 2^64 -> shift by the dropped-plane weight 2^{8 js}.

Exactness: the weighted conv value is bounded by N·2^12·2^7·(1+2^8+2^16+2^24)
< 2^53; the prime product 12289·13313·15361·18433 ≈ 2^54.6 covers it signed.
All intermediate arithmetic is int32 with f32-Barrett reductions (|x| < 2^28
everywhere before a reduction; q = round(x/p) is then within ±1 and two
conditional corrections make the result exact — pinned by
tests/test_ntt.py against the schoolbook negacirculant path).

Reference parity: computes the identical CMux-tree external product of
`circuit_bootstrapping_vertical_packing` (shortint_woppbs_1bit.rs:328);
selected by TFHE_VP_NTT=1 in ops/circuit_bootstrap.vertical_packing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

PRIMES = (12289, 13313, 15361, 18433)   # p = 1 (mod 2N) for N <= 512


def _find_psi(p: int, two_n: int) -> int:
    for g in range(2, p):
        if pow(g, (p - 1) // 2, p) != 1:
            psi = pow(g, (p - 1) // two_n, p)
            if pow(psi, two_n // 2, p) == p - 1:
                return psi
    raise ValueError(f"no primitive {two_n}-th root mod {p}")


@functools.lru_cache(maxsize=None)
def _mats_np(n: int, p: int):
    """(W, Winv) [N, N] int64 in [0, p): twisted negacyclic DFT matrices."""
    psi = _find_psi(p, 2 * n)
    omega = psi * psi % p
    om = np.array([pow(omega, x, p) for x in range(n)], np.int64)
    j = np.arange(n)
    jm = (j[:, None] * j[None, :]) % n
    tw = np.array([pow(psi, int(x), p) for x in j], np.int64)
    w = om[jm] * tw[:, None] % p
    ninv = pow(n, p - 2, p)
    psi_inv = pow(psi, p - 2, p)
    omi = np.array([pow(pow(omega, p - 2, p), x, p) for x in range(n)],
                   np.int64)
    tw_inv = np.array([pow(psi_inv, int(x), p) for x in j], np.int64)
    winv = omi[jm] * tw_inv[None, :] % p * ninv % p
    return w, winv


def _split8(m: np.ndarray):
    """int64 [0, 2^14) -> (lo int8 balanced, hi int8): m = lo + 256*hi."""
    lo = ((m + 128) % 256) - 128
    hi = (m - lo) >> 8
    return lo.astype(np.int8), hi.astype(np.int8)


@functools.lru_cache(maxsize=None)
def _mat_planes(n: int, p: int, inverse: bool):
    w, winv = _mats_np(n, p)
    return tuple(jnp.asarray(x) for x in _split8(winv if inverse else w))


def _barrett(x, p: int):
    """Exact x mod p into balanced (-p/2, p/2], int32.

    Exactness bound: the f32 estimate q = round(x·(1/p)) carries three
    roundings (x→f32, 1/p→f32, product), relative error < 4·2^-24, so
    q is within ±1 of round(x/p) for any |x| ≤ 2^30 (absolute drift
    |x/p|·2^-22 < 2^-5 for the 14-bit primes used here). Then
    |x − q·p| ≤ 3p/2 and the two one-sided correction steps below land r
    exactly in (-p/2, p/2]; all intermediates stay far inside int32.
    Callers reach ~2^29.4 (the R=5 pointwise sums and the in-frequency
    limb-weight sums for p=18433), inside the 2^30 bound.
    """
    q = jnp.round(x.astype(jnp.float32) * np.float32(1.0 / p)).astype(jnp.int32)
    r = x - q * jnp.int32(p)
    r = jnp.where(r > p // 2, r - p, r)
    r = jnp.where(r < -(p // 2), r + p, r)
    return r


def _transform(x, n: int, p: int, inverse: bool = False):
    """x int32 [..., N] balanced |x| < 2^13 -> X int32 [..., N] balanced mod p.

    Two balanced int8 limb planes of x against the two limb planes of the
    constant matrix: four int8 MXU dots, partials Barrett-folded before the
    scaled recombination keeps everything inside int32.
    """
    w0, w1 = _mat_planes(n, p, inverse)
    xl = ((x + 128) % 256) - 128
    xh = (x - xl) >> 8                                  # |xh| <= 2^5
    xl8 = xl.astype(jnp.int8)
    xh8 = xh.astype(jnp.int8)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    d00 = dot(xl8, w0)                                  # |.| <= 2^23
    d01 = dot(xl8, w1)
    d10 = dot(xh8, w0)
    d11 = dot(xh8, w1)
    c8 = jnp.int32(256 % p)
    c16 = jnp.int32((256 * 256) % p)
    t = _barrett(d00, p) + _barrett(d01 + d10, p) * c8 \
        + _barrett(d11, p) * c16                        # < 2^28
    return _barrett(t, p)


def _garner_u64(residues, primes):
    """CRT residues (balanced int32 per prime) -> value mod 2^64 (u64).

    Garner's mixed-radix reconstruction; the true integer is signed and
    |v| < P/2, so the final wrap to u64 is exact mod 2^64."""
    p1, p2, p3, p4 = primes
    r = [jnp.where(x < 0, x + p, x).astype(jnp.int64)
         for x, p in zip(residues, primes)]
    inv12 = pow(p1, p2 - 2, p2)
    inv13 = pow(p1 * p2 % p3, p3 - 2, p3)
    inv14 = pow(p1 * p2 * p3 % p4, p4 - 2, p4)
    c2 = (r[1] - r[0]) % p2 * inv12 % p2
    x12 = r[0] + c2 * p1                          # < p1*p2 ~ 2^27.3
    c3 = (r[2] - x12 % p3) % p3 * inv13 % p3
    x123 = x12 + c3 * (p1 * p2)                   # < 2^41
    c4 = (r[3] - x123 % p4) % p4 * inv14 % p4
    x = x123.astype(jnp.uint64) + c4.astype(jnp.uint64) * jnp.uint64(
        p1 * p2 * p3)
    big = jnp.uint64(p1 * p2 * p3 * p4)
    half = jnp.uint64(p1 * p2 * p3 * p4 // 2)
    return jnp.where(x > half, x - big, x)        # wraps negatives mod 2^64


def polymul_digits_ntt_grouped(digits, ext_planes, d_bound: int,
                               j_start: int = 0):
    """NTT lowering of polymul_digits_pallas_grouped (identical contract).

    digits:     [B, G, R, N] int32 gadget digits, |d| <= d_bound < 2^12
    ext_planes: [8-j_start, B, R, O, 2N] int8 (split_polys_for_pallas with
                the lowest j_start planes dropped; only the first N columns
                — the un-doubled polys — are read)
    -> [B, G, O, N] u64, exact mod 2^64 over the kept planes.
    """
    n_j, b, r, o, two_n = ext_planes.shape
    n = two_n // 2
    # the prime product covers R·N·d·127·(2^24+...) for d <= 2^12, 4 planes
    assert d_bound <= (1 << 12) and n_j <= 4 and r <= 5, (d_bound, n_j, r)
    ext = jnp.transpose(ext_planes[..., :n], (1, 3, 2, 0, 4))
    # [B, O, R, n_j, N] int8
    dig = jnp.asarray(digits, jnp.int32)

    outs = []
    for p in PRIMES:
        dp = _transform(dig, n, p)                       # [B, G, R, N]
        ep = _transform(ext.astype(jnp.int32), n, p)     # [B, O, R, nj, N]
        # fold the limb-plane weights in frequency: one operand per prime
        wts = jnp.asarray([(1 << (8 * j)) % p for j in range(n_j)],
                          jnp.int32)
        ew = _barrett(jnp.sum(ep * wts[:, None], axis=-2, dtype=jnp.int64
                              ).astype(jnp.int32), p)    # [B, O, R, N]
        # pointwise with the R contraction: products < 2^26, sum_R < 2^29.
        # An explicit broadcast-multiply loop over the R=5 rows — einsum
        # lowers this to (b, m)-batched [G,R]x[R,O] micro-dots, hostile to
        # the MXU (the shape disease PERF.md's NTT rejection predicted)
        pw = None
        for ri in range(r):
            term = dp[:, :, None, ri, :] * ew[:, None, :, ri, :]
            pw = term if pw is None else pw + term       # [B, G, O, N]
        outs.append(_transform(_barrett(pw, p), n, p, inverse=True))

    val = _garner_u64(outs, PRIMES)                      # [B, G, O, N] u64
    return val << jnp.uint64(8 * j_start)
