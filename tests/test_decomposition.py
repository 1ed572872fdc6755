"""Gadget decomposition invariants (ops/decomposition.py)."""

import numpy as np
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import decomposition


def _check(base_log, levels, xs):
    digits = np.asarray(decomposition.decompose(jnp.asarray(xs), base_log, levels))
    half = 1 << (base_log - 1)
    assert digits.min() >= -half and digits.max() < half
    weights = decomposition.gadget_weights(base_log, levels)
    recon = np.zeros_like(xs)
    with np.errstate(over="ignore"):
        for l, g in enumerate(weights):
            recon += digits[..., l].astype(np.int64).astype(np.uint64) * np.uint64(g)
    err = (recon - xs).astype(np.int64)  # wrapping difference, signed
    bound = 1 << (64 - base_log * levels - 1) if base_log * levels < 64 else 1
    assert np.abs(err).max() <= bound, (np.abs(err).max(), bound)


def test_decompose_reconstruction():
    rng = np.random.default_rng(4)
    xs = rng.integers(0, 1 << 64, 257, dtype=np.uint64)
    for base_log, levels in [(15, 2), (12, 3), (3, 4), (2, 6), (13, 1),
                             (16, 2), (24, 1), (9, 4), (6, 2), (10, 1)]:
        _check(base_log, levels, xs)


def test_decompose_edge_values():
    xs = np.array([0, 1, (1 << 64) - 1, 1 << 63, (1 << 63) - 1, 0x8000000000000123],
                  dtype=np.uint64)
    _check(12, 3, xs)
    _check(15, 2, xs)
