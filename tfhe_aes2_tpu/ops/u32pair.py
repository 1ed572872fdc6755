"""Native-u32 torus arithmetic: u64 values as (lo, hi) uint32 pairs.

XLA:TPU emulates 64-bit integers pairwise anyway, but its generic emulation
of gathers/shifts/compares in the blind-rotate hot loop measured ~10x slower
than hand-written u32-pair forms (probes/bench_probe.py). This module implements
exactly the ops the CMux scan needs — negacyclic rotation, wrapping add/sub,
gadget decomposition, int32-partial recombination — on native uint32 tensors.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def from_u64(x):
    """u64 [...] -> (lo, hi) u32."""
    x = jnp.asarray(x, jnp.uint64)
    lo = (x & jnp.uint64(0xFFFFFFFF)).astype(U32)
    hi = (x >> jnp.uint64(32)).astype(U32)
    return lo, hi


def to_u64(lo, hi):
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << jnp.uint64(32))


def add(a, b):
    """(lo,hi) + (lo,hi) mod 2^64."""
    lo = a[0] + b[0]
    carry = (lo < a[0]).astype(U32)
    return lo, a[1] + b[1] + carry


def sub(a, b):
    lo = a[0] - b[0]
    borrow = (a[0] < b[0]).astype(U32)
    return lo, a[1] - b[1] - borrow


def neg(a):
    lo = jnp.uint32(0) - a[0]
    borrow = (a[0] != 0).astype(U32)
    return lo, jnp.uint32(0) - a[1] - borrow


def _shift_pow2(pair, shift: int, n: int):
    """X^(2^k) · p for a STATIC amount `shift` (negacyclic): slice+concat+neg,
    pure layout/vector ops."""
    lo, hi = pair
    if shift == n:  # X^N = -1
        return neg(pair)
    tail_lo, tail_hi = neg((lo[..., n - shift:], hi[..., n - shift:]))
    return (jnp.concatenate([tail_lo, lo[..., : n - shift]], axis=-1),
            jnp.concatenate([tail_hi, hi[..., : n - shift]], axis=-1))


def static_rot(pair, t: int, n: int):
    """X^t · p for a STATIC integer t in [0, 2N) on a (lo, hi) pair [..., N]
    — the pair form of polynomial.monomial_mul_static: slice+concat+negate,
    no gather, no u64 emulation (the vertical-packing rotation stages use a
    compile-time step)."""
    t = t % (2 * n)
    if t == 0:
        return pair
    if t >= n:
        return neg(static_rot(pair, t - n, n))
    lo, hi = pair
    head_lo, head_hi = neg((lo[..., n - t:], hi[..., n - t:]))
    return (jnp.concatenate([head_lo, lo[..., : n - t]], axis=-1),
            jnp.concatenate([head_hi, hi[..., : n - t]], axis=-1))


def monomial_mul(pair, t, n: int):
    """X^t · p on (lo, hi) [..., N]; t int32 [...] (broadcastable to the
    batch dims) in [0, 2N).

    TPU gathers are scalar-bound, so the rotation is applied as a binary
    ladder: for each bit k of t, a static negacyclic shift by 2^k followed by
    a vectorized select — log2(2N) rounds of pure VPU work.
    """
    lo, hi = pair
    t = jnp.broadcast_to(jnp.asarray(t, jnp.int32), lo.shape[:-1])
    for k in range((2 * n).bit_length() - 1):  # bits of t < 2N
        bit = ((t >> k) & 1).astype(jnp.bool_)[..., None]
        s_lo, s_hi = _shift_pow2((lo, hi), (1 << k) % (2 * n), n) \
            if (1 << k) <= n else _shift_pow2(neg((lo, hi)), (1 << k) - n, n)
        lo = jnp.where(bit, s_lo, lo)
        hi = jnp.where(bit, s_hi, hi)
    return lo, hi


def decompose(pair, base_log: int, levels: int):
    """Balanced signed gadget digits from a (lo, hi) pair, int32
    [..., levels], most significant level first (ops/decomposition.py
    semantics, all in native u32)."""
    lo, hi = pair
    b = base_log
    total = b * levels
    shift = 64 - total
    # round: add 2^(shift-1) and drop `shift` low bits -> r has `total` bits
    if shift > 0:
        if shift - 1 < 32:
            rlo = lo + (jnp.uint32(1) << jnp.uint32(shift - 1))
            carry = (rlo < lo).astype(U32)
            rhi = hi + carry
        else:
            rlo = lo
            rhi = hi + (jnp.uint32(1) << jnp.uint32(shift - 1 - 32))
    else:
        rlo, rhi = lo, hi

    # r = (rhi ‖ rlo) >> shift, keeping `total` (< 64) bits; extract digit
    # fields directly from the pair with an offset-trick carry fixup.
    # y = r + H where H = Σ 2^(b-1+b·l); digits = fields of y minus 2^(b-1).
    # Compute y as a (lo, hi) pair.
    h = sum(1 << (b - 1 + b * l) for l in range(levels))
    h_lo = jnp.uint32(h & 0xFFFFFFFF)
    h_hi = jnp.uint32((h >> 32) & 0xFFFFFFFF)

    # r as a pair (value < 2^total): funnel shift right by `shift`
    if shift == 0:
        r_lo, r_hi = rlo, rhi
    elif shift < 32:
        r_lo = (rlo >> jnp.uint32(shift)) | (rhi << jnp.uint32(32 - shift))
        r_hi = rhi >> jnp.uint32(shift)
    else:
        r_lo = rhi >> jnp.uint32(shift - 32) if shift > 32 else rhi
        r_hi = jnp.zeros_like(rhi)

    y_lo = r_lo + h_lo
    carry = (y_lo < r_lo).astype(U32)
    y_hi = r_hi + h_hi + carry

    half = 1 << (b - 1)
    mask = jnp.uint32((1 << b) - 1) if b < 32 else jnp.uint32(0xFFFFFFFF)
    digits = []
    for l in range(levels):  # most significant first
        pos = b * (levels - 1 - l)
        if pos >= 32:
            field = (y_hi >> jnp.uint32(pos - 32)) & mask
        elif pos + b <= 32:
            field = (y_lo >> jnp.uint32(pos)) & mask
        else:
            field = ((y_lo >> jnp.uint32(pos)) | (y_hi << jnp.uint32(32 - pos))) & mask
        digits.append(field.astype(jnp.int32) - half)
    return jnp.stack(digits, axis=-1)


def accumulate_partials(partials: dict, limb_bits: int = 8):
    """{s: int32 [...]} partial sums with weight 2^(limb_bits·s) ->
    (lo, hi) u32 pair, exact mod 2^64."""
    lo = None
    hi = None
    for s, val in partials.items():
        sh = limb_bits * s
        v_lo = val.astype(U32)
        v_hi = (val >> 31).astype(U32)  # arithmetic sign extension bits
        # (v_hi‖v_lo) << sh
        if sh == 0:
            c_lo, c_hi = v_lo, v_hi
        elif sh < 32:
            c_lo = v_lo << jnp.uint32(sh)
            c_hi = (v_hi << jnp.uint32(sh)) | (v_lo >> jnp.uint32(32 - sh))
        else:
            c_lo = jnp.zeros_like(v_lo)
            c_hi = v_lo << jnp.uint32(sh - 32) if sh > 32 else v_lo
        if lo is None:
            lo, hi = c_lo, c_hi
        else:
            lo, hi = add((lo, hi), (c_lo, c_hi))
    return lo, hi
