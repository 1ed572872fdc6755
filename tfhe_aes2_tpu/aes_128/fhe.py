"""FHE AES-128 strategies + jitted server entry points.

Mirrors the reference's `Aes128Encrypt` strategy types
(fhe_impls/shortint_woppbs_1bit.rs:61,131): each strategy binds a round
pipeline to the shortint_woppbs_1bit model. The server computation (key
schedule + all rounds over the block batch) compiles to ONE XLA program; the
BitCt noise/independence bookkeeping runs at trace time.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np

from tfhe_aes2_tpu.aes_128 import sbox_gal_mul_pbs, sbox_pbs
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import (
    FheContext, fresh_bitct)


class ShortintWoppbs1BitSboxGalMulPbsAesEncrypt:
    """Production strategy: model shortint_woppbs_1bit + pipeline
    fhe_sbox_gal_mul_pbs (the reference's submitted solution, README.md:9-11)."""

    pipeline = sbox_gal_mul_pbs


class ShortintWoppbs1BitSboxPbsAesEncrypt:
    """Model shortint_woppbs_1bit + pipeline fhe_sbox_pbs (leveled Galois
    multiplication; kept for parity — its noise components are not independent,
    matching the reference's ignored tests,
    fhe_impls/shortint_woppbs_1bit.rs:160-174)."""

    pipeline = sbox_pbs


def _run_with_clear_schedule(pipeline, params, rounds, sks, ks_arr, blocks_arr):
    ctx = FheContext(params, sks)
    eks = fresh_bitct(ks_arr, ctx, lane_ndim=3)        # [44, 4, 8] lanes
    blocks = fresh_bitct(blocks_arr, ctx, lane_ndim=2)  # batch + [16, 8]
    out = pipeline.encrypt_block_for_rounds(ctx, eks, blocks, rounds)
    return out.array


def _run_full(pipeline, params, rounds, sks, key_arr, blocks_arr):
    ctx = FheContext(params, sks)
    key = fresh_bitct(key_arr, ctx, lane_ndim=2)        # [16, 8] lanes
    blocks = fresh_bitct(blocks_arr, ctx, lane_ndim=2)
    eks = pipeline.key_schedule(ctx, key)
    out = pipeline.encrypt_block_for_rounds(ctx, eks, blocks, rounds)
    return out.array


def make_encrypt_blocks_fn(strategy, params, rounds: int):
    """Jitted (sks, ks_cts [44,4,8,n1], blocks [B,16,8,n1]) -> [B,16,8,n1].

    The key schedule is supplied encrypted (test_light path,
    test_helper.rs:94-120)."""
    return jax.jit(partial(_run_with_clear_schedule, strategy.pipeline, params,
                           rounds))


def make_full_aes_fn(strategy, params, rounds: int = 10):
    """Jitted (sks, key_cts [16,8,n1], blocks [B,16,8,n1]) -> [B,16,8,n1].

    FHE key expansion + block encryption in one XLA program (the reference's
    expand_key + encrypt_blocks, main.rs:119-120)."""
    return jax.jit(partial(_run_full, strategy.pipeline, params, rounds))


def key_schedule_eager(strategy, ctx, key_arr):
    """Eager-orchestrated FHE key expansion: the 44 sequential words reuse a
    handful of per-shape compiled circuit-bootstrap kernels instead of one
    monolithic 44-scan XLA program."""
    key = fresh_bitct(key_arr, ctx, lane_ndim=2)
    return strategy.pipeline.key_schedule(ctx, key)


def encrypt_blocks_eager(strategy, ctx, eks, blocks_arr, rounds: int):
    """Eager-orchestrated AES rounds; `eks` is the BitCt from
    key_schedule_eager (or fresh-wrapped arrays for a clear schedule)."""
    blocks = fresh_bitct(blocks_arr, ctx, lane_ndim=2)
    return strategy.pipeline.encrypt_block_for_rounds(ctx, eks, blocks, rounds)


def make_key_schedule_fn(strategy, params):
    """Jitted (sks, key_cts [16,8,n1]) -> expanded key [44,4,8,n1]."""
    def fn(sks, key_arr):
        ctx = FheContext(params, sks)
        key = fresh_bitct(key_arr, ctx, lane_ndim=2)
        return strategy.pipeline.key_schedule(ctx, key).array
    return jax.jit(fn)
