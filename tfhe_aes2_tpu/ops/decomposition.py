"""Signed gadget decomposition (balanced base-2^B digits).

TPU-native equivalent of tfhe-rs `SignedDecomposer` (used by keyswitches and
external products; reference call sites SURVEY.md §2.3). Branch-free closed
form: round to the representable grid, then extract balanced digits with the
offset trick — no sequential carry chain, fully vectorized.

Digit `d[l]` (l = 0 most significant) has weight g_l = 2^(64 - B*(l+1)) and
value in [-2^(B-1), 2^(B-1)); Σ_l d[l]·g_l ≡ round(x) (mod 2^64) with
|round(x) - x| <= 2^(64 - B*L - 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from tfhe_aes2_tpu.ops.torus import U64


def gadget_weights(base_log: int, levels: int):
    """g_l = 2^(64 - B(l+1)) as u64, l = 0..levels-1 (most significant first)."""
    return [1 << (64 - base_log * (l + 1)) for l in range(levels)]


def decompose(x, base_log: int, levels: int):
    """x u64 [...] -> digits int32 [..., levels], most significant level first."""
    x = jnp.asarray(x, U64)
    b = base_log
    total = b * levels
    assert total <= 64
    shift = 64 - total

    if shift > 0:
        r = (x + (jnp.uint64(1) << jnp.uint64(shift - 1))) >> jnp.uint64(shift)
    else:
        r = x

    # offset trick: add 2^(B-1) at every digit position, extract plain digits,
    # subtract 2^(B-1). Carries propagate inside the addition.
    h = sum(1 << (b - 1 + b * l) for l in range(levels))
    y = r + jnp.uint64(h)

    digits = []
    half = 1 << (b - 1)
    mask = jnp.uint64((1 << b) - 1)
    for l in range(levels):  # l = 0 is most significant -> highest position
        pos = b * (levels - 1 - l)
        d = ((y >> jnp.uint64(pos)) & mask).astype(jnp.int32) - half
        digits.append(d)
    return jnp.stack(digits, axis=-1)


def digit_bound(base_log: int) -> int:
    """Inclusive bound on |digit| (the balanced range is [-2^(B-1), 2^(B-1)))."""
    return 1 << (base_log - 1)
