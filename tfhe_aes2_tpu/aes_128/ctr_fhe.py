"""Server-side homomorphic CTR keystream counter.

The reference builds its CTR blocks client-side (iv ‖ big-endian u64
counter, main.rs:108-115) and demonstrates homomorphic counter increments
only as tests (the bytewise 9-in/9-out LUT adder,
shortint_woppbs_1bit.rs:833-877). Here that adder is a first-class serving
mode (scenario `fhe_counter=True`, CLI `--fhe-counter`): the client uploads
ONE encrypted iv‖ctr block and the server derives the remaining blocks by
chained homomorphic increments of the counter half (bytes 8..15, wrapping
mod 2^64) before running the batched AES pipeline — the keystream extends
server-side without further client upload (each fresh production block ct
is ~2.1 MB on the wire).

One increment = 8 chained circuit bootstraps of [carry ‖ byte] through a
shared 9->9 LUT computing byte+carry (LSB byte first; the carry out of the
top counter byte is dropped, so the counter wraps exactly like the
reference's u64). Every derived bit is a bootstrap output, so derived
blocks enter the AES rounds with nominal noise, the same contract as fresh
client encryptions at the staged program boundary (fhe.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.models.shortint_woppbs_1bit import (
    BitCt, FheContext, fresh_bitct)


def increment_lut(ctx: FheContext) -> np.ndarray:
    """9->9 LUT [carry, b7..b0] -> [carry_out, sum byte]
    (shortint_woppbs_1bit.rs:833-877)."""
    return ctx.generate_lookup_table(9, 9, lambda v: (v & 0xFF) + (v >> 8))


def increment_block(ctx: FheContext, block: BitCt, lut,
                    counter_bytes: int = 8) -> BitCt:
    """block (lanes [16, 8], MSB-first bits) + 1 on the trailing
    `counter_bytes` bytes read as one big-endian integer; the leading bytes
    (the IV half) pass through untouched."""
    n_bytes = block.lane_shape[0]
    carry = ctx.trivial_bits(np.array([1]))
    pieces = []
    for i in range(n_bytes - 1, n_bytes - counter_bytes - 1, -1):
        byte = block.slice_lanes(slice(i, i + 1), axis=0).reshape_lanes(8)
        nine = BitCt.concat_lanes([carry, byte], axis=0)
        out = ctx.circuit_bootstrap(nine, lut)
        carry = out.slice_lanes(slice(0, 1), axis=0)
        pieces.append(out.slice_lanes(slice(1, 9), axis=0).reshape_lanes(1, 8))
    pieces.reverse()
    kept = block.slice_lanes(slice(0, n_bytes - counter_bytes), axis=0)
    return BitCt.concat_lanes([kept] + pieces, axis=0)


def derive_ctr_blocks(ctx: FheContext, block0_arr, count: int,
                      counter_bytes: int = 8) -> jnp.ndarray:
    """Chained eager derivation: [count, 16, 8, kN+1] from one encrypted
    block ct (counter values c0, c0+1, ..., c0+count-1). Each 9-bit
    bootstrap reuses one cached compiled kernel (FheContext dispatch)."""
    lut = increment_lut(ctx)
    cur = fresh_bitct(jnp.asarray(block0_arr), ctx, lane_ndim=2)
    arrays = [cur.array]
    for _ in range(count - 1):
        cur = increment_block(ctx, cur, lut, counter_bytes)
        arrays.append(cur.array)
    return jnp.stack(arrays)


def _increment_program(params, counter_bytes, sks, block_arr, lut_arr):
    ctx = FheContext(params, sks)
    block = fresh_bitct(block_arr, ctx, lane_ndim=2)
    return increment_block(ctx, block, lut_arr, counter_bytes).array


def derive_ctr_blocks_staged(ctx: FheContext, block0_arr, count: int,
                             counter_bytes: int = 8) -> jnp.ndarray:
    """Like derive_ctr_blocks, but each increment runs as ONE compiled
    program (8 chained bootstraps inside), reused for all count-1
    increments — 1 device dispatch per derived block instead of 8, which
    matters on tunneled accelerators (~70-100ms per dispatch)."""
    lut = jnp.asarray(increment_lut(ctx))
    block0_arr = jnp.asarray(block0_arr)
    key = ("ctr_inc", jnp.shape(block0_arr), counter_bytes)
    cache = ctx._cbs_kernel_cache
    if key not in cache:
        cache[key] = jax.jit(partial(_increment_program, ctx.params,
                                     counter_bytes))
    fn = cache[key]
    arrays = [block0_arr]
    for _ in range(count - 1):
        arrays.append(fn(ctx.sks, arrays[-1], lut))
    return jnp.stack(arrays)


def derived_blocks_meta(ctx: FheContext, block0_arr, count: int,
                        counter_bytes: int = 8):
    """Conservative per-lane metadata for a derive_ctr_blocks* batch.

    A BitCt tracks ONE metadata slot per lane shared across the batch axis
    (models/shortint_woppbs_1bit.BitCt); the derived blocks differ per batch
    entry (block 0 is fresh, later counters carry 9-bit-adder bootstrap
    noise), so this shadow-traces the increment chain and takes the per-lane
    MAX noise over the batch — sound for the budget check — with one fresh
    id per lane. NOTE the id convention's limit: the IV lanes of every
    derived block are literally the SAME ciphertexts as block 0's
    (increment_block passes them through), NOT iid across the batch; only
    the counter lanes are per-block bootstrap outputs. One id per lane is
    sound today because no circuit XORs two different batch entries with
    each other; if a cross-batch-entry combine op is ever added, the
    independence check must first split ids per batch entry."""
    from tfhe_aes2_tpu.aes_128.fhe import _shadow_bitct

    lut = increment_lut(ctx)
    cur = fresh_bitct(jnp.asarray(block0_arr), ctx, lane_ndim=2)
    noise = cur.noise_sq.copy()
    for _ in range(count - 1):
        meta = _shadow_bitct(
            ctx, lambda mctx, b: increment_block(mctx, b, lut, counter_bytes),
            [cur])
        cur = BitCt(cur.array, meta[0], meta[1], ctx)
        noise = np.maximum(noise, meta[0])
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import _fresh_ids
    return noise, _fresh_ids(noise.shape)
