"""FHE AES-128 strategies + server entry points.

Mirrors the reference's `Aes128Encrypt` strategy types
(fhe_impls/*): each strategy binds a round pipeline to an FHE model. Two
execution modes: whole-program jit (tests, graft entry) and eager
orchestration with per-shape compiled bootstrap kernels (production — bounds
XLA program size; see FheContext.circuit_bootstrap).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.aes_128 import sbox_gal_mul_pbs, sbox_pbs
from tfhe_aes2_tpu.models import shortint_woppbs_1bit as m1
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import (
    BitCt, FheContext, fresh_bitct, meta_context)
from tfhe_aes2_tpu.ops.torus import U64


class ShortintWoppbs1BitSboxGalMulPbsAesEncrypt:
    """Production strategy: model shortint_woppbs_1bit + pipeline
    fhe_sbox_gal_mul_pbs (the reference's submitted solution, README.md:9-11)."""

    pipeline = sbox_gal_mul_pbs
    make_context = staticmethod(FheContext)

    # client-side codecs (big-key bit encryption, fhe_encryption.rs)
    @staticmethod
    def encrypt_client(client, data_bytes_list):
        from tfhe_aes2_tpu.aes_128 import fhe_encryption
        return fhe_encryption.encrypt_blocks(client, data_bytes_list)

    @staticmethod
    def encrypt_key_client(client, key):
        from tfhe_aes2_tpu.aes_128 import fhe_encryption
        return fhe_encryption.encrypt_byte_array(client, key)

    @staticmethod
    def decrypt_client(client, arrays):
        from tfhe_aes2_tpu.aes_128 import fhe_encryption
        return fhe_encryption.decrypt_blocks(client, arrays)

    @staticmethod
    def make_ops(ctx):
        return None  # pipeline B is 1-bit-model-specific

    fresh = staticmethod(fresh_bitct)


class ShortintWoppbs1BitSboxPbsAesEncrypt:
    """Model shortint_woppbs_1bit + pipeline fhe_sbox_pbs (leveled Galois
    multiplication, depth-11; pairs with the sqrd_lvl_256 parameters)."""

    pipeline = sbox_pbs
    make_context = staticmethod(FheContext)

    @staticmethod
    def make_ops(ctx):
        return sbox_pbs.Woppbs1BitByteOps(ctx)

    fresh = staticmethod(fresh_bitct)


class ShortintWoppbs8BitSboxPbsAesEncrypt:
    """Model shortint_woppbs_8bit + pipeline fhe_sbox_pbs: SBOX on single
    8-bit ciphertexts, XOR on extracted 1-bit duals
    (fhe_impls/shortint_woppbs_8bit.rs:44-94)."""

    pipeline = sbox_pbs

    @staticmethod
    def make_context(params, sks):
        from tfhe_aes2_tpu.models import shortint_woppbs_8bit as m8
        return m8.FheContext(params, sks)

    # client-side codecs: bits live under the SMALL key in this model
    @staticmethod
    def encrypt_client(client, data_bytes_list):
        import numpy as np_
        arr = np_.stack([np_.frombuffer(bytes(b), np_.uint8) for b in data_bytes_list])
        bits = np_.unpackbits(arr[..., None], axis=-1)
        return client.encrypt_bits_small(bits)

    @staticmethod
    def encrypt_key_client(client, key):
        import numpy as np_
        bits = np_.unpackbits(np_.frombuffer(bytes(key), np_.uint8)[..., None], axis=-1)
        return client.encrypt_bits_small(bits)

    @staticmethod
    def decrypt_client(client, arrays):
        import numpy as np_
        bits = client.decrypt_bits_small(np_.asarray(arrays)).astype(np_.uint8)
        return [row.tobytes() for row in np_.packbits(bits, axis=-1)[..., 0]]

    @staticmethod
    def make_ops(ctx):
        from tfhe_aes2_tpu.models.shortint_woppbs_8bit import Woppbs8BitByteOps
        return Woppbs8BitByteOps(ctx)

    @staticmethod
    def fresh(arrays, ctx, lane_ndim=None):
        from tfhe_aes2_tpu.models.shortint_woppbs_8bit import fresh_linear_bitct
        return fresh_linear_bitct(arrays, ctx)


class Shortint1BitSboxPbsAesEncrypt:
    """Model shortint_1bit + pipeline fhe_sbox_pbs: SBOX as 8 per-output-bit
    tree bootstraps (255 blind rotations each, batched across bytes/bits).

    Ships for API/CLI parity with the reference, which dispatches
    `Shortint1BitSboxPbsAesEncrypt` from the binary
    (fhe_impls/shortint_1bit.rs:52, main.rs:60-92) while #[ignore]-ing its AES
    tests ("too big noise accumulation", fhe_impls/shortint_1bit.rs:81-83);
    the equivalent test here is skipped with the same reason."""

    pipeline = sbox_pbs

    @staticmethod
    def make_context(params, sks):
        from tfhe_aes2_tpu.models import shortint_1bit as m1b
        return m1b.FheContext(params, sks)

    # client-side codecs: bits at 2^62 under the SMALL key
    # (shortint_1bit.rs:352-356)
    @staticmethod
    def _encode(bits):
        return np.asarray(bits, np.uint64) << np.uint64(62)

    @classmethod
    def encrypt_client(cls, client, data_bytes_list):
        arr = np.stack([np.frombuffer(bytes(b), np.uint8)
                        for b in data_bytes_list])
        bits = np.unpackbits(arr[..., None], axis=-1)
        return client.encrypt_encodings_small(cls._encode(bits))

    @classmethod
    def encrypt_key_client(cls, client, key):
        bits = np.unpackbits(np.frombuffer(bytes(key), np.uint8)[..., None],
                             axis=-1)
        return client.encrypt_encodings_small(cls._encode(bits))

    @staticmethod
    def decrypt_client(client, arrays):
        phase = client.decrypt_phase_small(np.asarray(arrays))
        bits = (((phase + np.uint64(1 << 61)) >> np.uint64(62))
                & np.uint64(1)).astype(np.uint8)
        return [row.tobytes() for row in np.packbits(bits, axis=-1)[..., 0]]

    @staticmethod
    def make_ops(ctx):
        from tfhe_aes2_tpu.models.shortint_1bit import Shortint1BitByteOps
        return Shortint1BitByteOps(ctx)

    @staticmethod
    def fresh(arrays, ctx, lane_ndim=None):
        from tfhe_aes2_tpu.models.shortint_1bit import fresh_lane_bit1ct
        return fresh_lane_bit1ct(arrays, ctx, lane_ndim)


def _pipeline_kwargs(strategy, ctx):
    ops = strategy.make_ops(ctx)
    return {} if ops is None else {"ops": ops}


def _run_with_clear_schedule(strategy, params, rounds, sks, ks_arr, blocks_arr):
    ctx = strategy.make_context(params, sks)
    eks = strategy.fresh(ks_arr, ctx, lane_ndim=3)        # [44, 4, 8] lanes
    blocks = strategy.fresh(blocks_arr, ctx, lane_ndim=2)  # batch + [16, 8]
    out = strategy.pipeline.encrypt_block_for_rounds(
        ctx, eks, blocks, rounds, **_pipeline_kwargs(strategy, ctx))
    return out.array


def _run_full(strategy, params, rounds, sks, key_arr, blocks_arr):
    ctx = strategy.make_context(params, sks)
    key = strategy.fresh(key_arr, ctx, lane_ndim=2)        # [16, 8] lanes
    blocks = strategy.fresh(blocks_arr, ctx, lane_ndim=2)
    kw = _pipeline_kwargs(strategy, ctx)
    eks = strategy.pipeline.key_schedule(ctx, key, **kw)
    out = strategy.pipeline.encrypt_block_for_rounds(ctx, eks, blocks, rounds, **kw)
    return out.array


def make_encrypt_blocks_fn(strategy, params, rounds: int):
    """Jitted (sks, ks_cts [44,4,8,n1], blocks [B,16,8,n1]) -> [B,16,8,n1].

    The key schedule is supplied encrypted (test_light path,
    test_helper.rs:94-120)."""
    return jax.jit(partial(_run_with_clear_schedule, strategy, params, rounds))


def make_full_aes_fn(strategy, params, rounds: int = 10):
    """Jitted (sks, key_cts [16,8,n1], blocks [B,16,8,n1]) -> [B,16,8,n1].

    FHE key expansion + block encryption in one XLA program (the reference's
    expand_key + encrypt_blocks, main.rs:119-120)."""
    return jax.jit(partial(_run_full, strategy, params, rounds))


def key_schedule_eager(strategy, ctx, key_arr):
    """Eager-orchestrated FHE key expansion: the 44 sequential words reuse a
    handful of per-shape compiled circuit-bootstrap kernels instead of one
    monolithic 44-scan XLA program."""
    key = strategy.fresh(key_arr, ctx, lane_ndim=2)
    return strategy.pipeline.key_schedule(ctx, key,
                                          **_pipeline_kwargs(strategy, ctx))


def encrypt_blocks_eager(strategy, ctx, eks, blocks_arr, rounds: int):
    """Eager-orchestrated AES rounds; `eks` is the BitCt from
    key_schedule_eager (or fresh-wrapped arrays for a clear schedule)."""
    blocks = strategy.fresh(blocks_arr, ctx, lane_ndim=2)
    return strategy.pipeline.encrypt_block_for_rounds(
        ctx, eks, blocks, rounds, **_pipeline_kwargs(strategy, ctx))


# ---------------- staged execution (round-level jit kernels) ----------------
# One compiled program per round *type*, reused across rounds and key-schedule
# words: ~6 small XLA programs and ~55 device dispatches per batch instead of
# one monolithic 51-scan program or hundreds of eager ops. This is the
# production path for remote/tunneled accelerators.

def _kernel(ctx, key, make):
    cache = ctx._cbs_kernel_cache if hasattr(ctx, "_cbs_kernel_cache") else ctx._kernel_cache
    if key not in cache:
        cache[key] = make()
    return cache[key]


def _shadow_bitct(ctx, build, in_cts):
    """TRUE-metadata shadow of one staged program.

    Abstract-evals `build` (meta_ctx, *BitCts -> BitCt) under jax.eval_shape
    with the incoming metadata attached; the meta context stubs the heavy
    bootstraps (models/shortint_woppbs_1bit.meta_context), so only the
    metadata transform — the noise-budget validation and the component
    independence check of every XOR (shortint_woppbs_1bit.rs:63-78,134-142)
    — actually executes, at trace cost (no compile, no device work).
    Returns (noise_sq, comps) of the output; raises NoiseError BEFORE the
    compiled program would dispatch, like the reference's eager panic."""
    mctx = meta_context(ctx)
    captured = {}

    def f(*arrs):
        cts = [BitCt(a, c.noise_sq, c.comps, mctx)
               for c, a in zip(in_cts, arrs)]
        out = build(mctx, *cts)
        captured["meta"] = (out.noise_sq, out.comps)
        return out.array

    jax.eval_shape(f, *[jax.ShapeDtypeStruct(jnp.shape(c.array), U64)
                        for c in in_cts])
    return captured["meta"]


def whole_program_meta(strategy, ctx, key_ct, blocks_ct, rounds: int):
    """Metadata of the FULL single-program path (FHE key schedule + rounds),
    shadow-traced — the comparison authority for the staged path's threaded
    metadata (tests/test_staged_meta.py)."""
    def build(mctx, key, blocks):
        kw = _pipeline_kwargs(strategy, mctx)
        eks = strategy.pipeline.key_schedule(mctx, key, **kw)
        return strategy.pipeline.encrypt_block_for_rounds(
            mctx, eks, blocks, rounds, **kw)

    return _shadow_bitct(ctx, build, [key_ct, blocks_ct])


def _tracks_meta(ctx) -> bool:
    """Staged metadata threading runs on the production model's context (the
    other models keep their own schemes and fall back to fresh wraps)."""
    return isinstance(ctx, FheContext) and not ctx.meta_only


def _staged_round(strategy, params, final, sks, state_arr, key_arr):
    ctx = strategy.make_context(params, sks)
    state = strategy.fresh(state_arr, ctx, lane_ndim=2)
    key_group = strategy.fresh(key_arr, ctx, lane_ndim=2)
    fn = strategy.pipeline.final_round if final else strategy.pipeline.middle_round
    ops = strategy.make_ops(ctx)
    kw = {} if ops is None else {"ops": ops}
    return fn(ctx, state, key_group, **kw).array


def _staged_ks_subxor(strategy, params, sks, base_arr, rc_bits):
    """First half of one key-schedule group: RotWord/SubWord (32-lane cbs) +
    the XOR chain — compiled SEPARATELY from the boot half (the combined
    two-blind-rotate program compiles ~3x slower than its halves; probe15)."""
    import numpy as _np
    from tfhe_aes2_tpu.ops import lwe as lwe_ops
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import _empty_ids

    ctx = strategy.make_context(params, sks)
    base = strategy.fresh(base_arr, ctx, lane_ndim=3)      # [4, 4, 8] lanes
    prev = base.slice_lanes(slice(3, 4), axis=0).reshape_lanes(4, 8)
    rc_arr = lwe_ops.trivial_bits(rc_bits, base.array.shape[-1] - 1)
    rc = type(base)(rc_arr, _np.zeros((8,), _np.int64), _empty_ids((8,)), ctx)
    return strategy.pipeline.key_schedule_group_preboot(ctx, base, prev,
                                                        rc).array


def _staged_ks_boot(strategy, params, sks, group_arr):
    """Second half: the 128-lane identity noise-reset bootstrap."""
    ctx = strategy.make_context(params, sks)
    group = strategy.fresh(group_arr, ctx, lane_ndim=3)
    return strategy.pipeline.boot_word(ctx, group).array


def _staged_ks_fused(strategy, params, sks, preboot_arr, rc_bits):
    """Fused key-schedule step (VERDICT r4 #6): the boot of group g and the
    SubWord bootstrap of group g+1 share ONE circuit-bootstrap front end
    (key_schedule_fused_boot_sub — a single 677-step blind rotation for 160
    lanes instead of two sequential scans whose cost is dominated by
    batch-independent per-step work), then the cheap XOR epilogue builds
    group g+1's preboot words. (sks, preboot_g [4,4,8,n1], rc bits [8]) ->
    (booted_g, preboot_{g+1}). Still a single-blind-rotate XLA module, so
    the probe15 compile blow-up of the old combined program does not apply."""
    import numpy as _np
    from tfhe_aes2_tpu.ops import lwe as lwe_ops
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import _empty_ids

    ctx = strategy.make_context(params, sks)
    preboot = strategy.fresh(preboot_arr, ctx, lane_ndim=3)    # [4, 4, 8]
    booted, sub = strategy.pipeline.key_schedule_fused_boot_sub(ctx, preboot)
    rc_arr = lwe_ops.trivial_bits(rc_bits, preboot.array.shape[-1] - 1)
    rc = type(preboot)(rc_arr, _np.zeros((8,), _np.int64), _empty_ids((8,)),
                       ctx)
    nxt = strategy.pipeline.key_schedule_group_preboot(ctx, booted, None, rc,
                                                       sub=sub)
    return booted.array, nxt.array


def key_schedule_staged(strategy, ctx, key_arr):
    """FHE key expansion via reused compiled group kernels.

    Default (fused, TFHE_KS_FUSED=0 disables): 11 sequential dispatches —
    subxor of group 1, then 9 fused steps each running [boot of group g ‖
    SubWord of group g+1] through ONE shared circuit-bootstrap front end
    (_staged_ks_fused), then the final boot. The old split path (20
    dispatches, two scans per group) remains as the fallback.

    On the production model the TRUE noise metadata is threaded across the
    program boundaries by shadow-tracing each program (_shadow_bitct), so
    the served path runs the same always-on accounting as the whole-program
    jit (reference shortint_woppbs_1bit.rs:134-142) and the returned BitCt
    carries the real per-word metadata into the rounds."""
    import os as os_

    import numpy as np_
    from tfhe_aes2_tpu.aes_128 import RC

    params = ctx.params
    if not hasattr(strategy.pipeline, "key_schedule_group_preboot"):
        return key_schedule_eager(strategy, ctx, key_arr)
    fused = (hasattr(strategy.pipeline, "key_schedule_fused_boot_sub")
             and os_.environ.get("TFHE_KS_FUSED", "1") != "0")
    # split at the boot either way (probe15: a TWO-blind-rotate program
    # compiles ~3x slower than its halves and was the dominant cold-start
    # item; the fused step keeps a SINGLE blind rotation per program)
    sub_fn = _kernel(ctx, "ks_subxor", lambda: jax.jit(
        partial(_staged_ks_subxor, strategy, params)))
    boot_fn = _kernel(ctx, "ks_boot", lambda: jax.jit(
        partial(_staged_ks_boot, strategy, params)))

    key_arr = jnp.asarray(key_arr)
    track = _tracks_meta(ctx)
    group0 = key_arr.reshape((4, 4) + key_arr.shape[1:])
    rc_bits = lambda g: np_.unpackbits(np_.array([RC[g]], np_.uint8))

    if not fused:
        groups = [group0]
        if track:
            first = fresh_bitct(groups[0], ctx, lane_ndim=3)
            metas = [(first.noise_sq, first.comps)]
        for g in range(1, 11):
            rc_np = rc_bits(g)
            if track:
                def build(mctx, base, rc_np=rc_np):
                    prev = base.slice_lanes(slice(3, 4),
                                            axis=0).reshape_lanes(4, 8)
                    rc = mctx.trivial_bits(rc_np)
                    return strategy.pipeline.key_schedule_group(mctx, base,
                                                                prev, rc)
                metas.append(_shadow_bitct(
                    ctx, build, [BitCt(groups[-1], *metas[-1], ctx)]))
            groups.append(boot_fn(ctx.sks, sub_fn(ctx.sks, groups[-1],
                                                  jnp.asarray(rc_np))))
    else:
        fused_fn = _kernel(ctx, "ks_fused", lambda: jax.jit(
            partial(_staged_ks_fused, strategy, params)))
        groups = [group0]
        if track:
            first = fresh_bitct(group0, ctx, lane_ndim=3)
            metas = [(first.noise_sq, first.comps)]

            def build0(mctx, base):
                prev = base.slice_lanes(slice(3, 4),
                                        axis=0).reshape_lanes(4, 8)
                return strategy.pipeline.key_schedule_group_preboot(
                    mctx, base, prev, mctx.trivial_bits(rc_bits(1)))
            pre_meta = _shadow_bitct(ctx, build0,
                                     [BitCt(group0, *metas[0], ctx)])
        pre = sub_fn(ctx.sks, group0, jnp.asarray(rc_bits(1)))
        for g in range(1, 10):
            rc_np = rc_bits(g + 1)
            if track:
                def build(mctx, pre_ct, rc_np=rc_np):
                    booted, sub = strategy.pipeline.key_schedule_fused_boot_sub(
                        mctx, pre_ct)
                    nxt = strategy.pipeline.key_schedule_group_preboot(
                        mctx, booted, None, mctx.trivial_bits(rc_np), sub=sub)
                    return BitCt.concat_lanes([booted, nxt], axis=0)
                both = _shadow_bitct(ctx, build, [BitCt(pre, *pre_meta, ctx)])
                metas.append((both[0][:4], both[1][:4]))
                pre_meta = (both[0][4:], both[1][4:])
            booted, pre = fused_fn(ctx.sks, pre, jnp.asarray(rc_np))
            groups.append(booted)
        if track:
            metas.append(_shadow_bitct(
                ctx, lambda mctx, p: strategy.pipeline.boot_word(mctx, p),
                [BitCt(pre, *pre_meta, ctx)]))
        groups.append(boot_fn(ctx.sks, pre))

    eks_arr = jnp.concatenate(groups, axis=0)
    if track:
        return BitCt(eks_arr,
                     np.concatenate([m[0] for m in metas], axis=0),
                     np.concatenate([m[1] for m in metas], axis=0), ctx)
    return strategy.fresh(eks_arr, ctx, lane_ndim=3)


def _staged_lat_mid(strategy, params, sks, preboot_arr, state_arr, rc_bits):
    """Latency-mode middle program: one shared cbs front end for [group-g
    boot ‖ group-g+1 SubWord ‖ round-g SubBytes+GalMul] + cheap epilogues
    (sbox_gal_mul_pbs.latency_fused_middle)."""
    import numpy as _np
    from tfhe_aes2_tpu.ops import lwe as lwe_ops
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import _empty_ids

    ctx = strategy.make_context(params, sks)
    preboot = strategy.fresh(preboot_arr, ctx, lane_ndim=3)
    state = strategy.fresh(state_arr, ctx, lane_ndim=2)
    rc_arr = lwe_ops.trivial_bits(rc_bits, preboot.array.shape[-1] - 1)
    rc = type(preboot)(rc_arr, _np.zeros((8,), _np.int64), _empty_ids((8,)),
                       ctx)
    nxt, st, booted = strategy.pipeline.latency_fused_middle(ctx, preboot,
                                                             state, rc)
    return nxt.array, st.array, booted.array


def _staged_lat_fin(strategy, params, sks, preboot_arr, state_arr):
    """Latency-mode final program: [group-10 boot ‖ final SubBytes] + the
    last ShiftRows/AddRoundKey."""
    ctx = strategy.make_context(params, sks)
    preboot = strategy.fresh(preboot_arr, ctx, lane_ndim=3)
    state = strategy.fresh(state_arr, ctx, lane_ndim=2)
    out, booted = strategy.pipeline.latency_fused_final(ctx, preboot, state)
    return out.array, booted.array


def encrypt_block_latency(strategy, ctx, key_arr, block_arr,
                          return_eks: bool = False):
    """Single-block minimum-latency path: FHE key expansion AND all ten
    rounds in 11 sequential fused scans (VERDICT r4 #6).

    The device executes programs serially, so 1-block latency is the SUM of
    scan times; the throughput path pays (11 key-schedule + 10 round) scans
    whose per-step cost at tiny batch is dominated by batch-independent
    work. Here round g's 128 SubBytes lanes ride the SAME blind rotation as
    key-schedule group g's boot and group g+1's SubWord (288 lanes — the
    marginal dot cost is small), because round g's AddRoundKey key is
    exactly the group booted in that scan. 11 scans total.

    key_arr [16, 8, n1]; block_arr [16, 8, n1] (or a leading batch axis of
    1). Returns a BitCt with lanes [16, 8] (true threaded metadata on the
    production model), decrypt-identical to the staged/whole-program paths.
    return_eks=True additionally returns the full expanded key assembled
    from the booted groups the scans computed anyway — serve.py caches it
    so follow-up requests under the same key run the batch path without
    re-expansion."""
    import numpy as np_
    from tfhe_aes2_tpu.aes_128 import RC

    params = ctx.params
    key_arr = jnp.asarray(key_arr)
    block_arr = jnp.asarray(block_arr)
    batched = block_arr.ndim == 4
    if batched:
        assert block_arr.shape[0] == 1, "latency path is single-block"
        block_arr = block_arr[0]

    sub_fn = _kernel(ctx, "ks_subxor", lambda: jax.jit(
        partial(_staged_ks_subxor, strategy, params)))
    mid_fn = _kernel(ctx, "lat_mid", lambda: jax.jit(
        partial(_staged_lat_mid, strategy, params)))
    fin_fn = _kernel(ctx, "lat_fin", lambda: jax.jit(
        partial(_staged_lat_fin, strategy, params)))

    group0 = key_arr.reshape((4, 4) + key_arr.shape[1:])
    rc_bits = lambda g: np_.unpackbits(np_.array([RC[g]], np_.uint8))
    track = _tracks_meta(ctx)

    if track:
        key_ct = fresh_bitct(group0, ctx, lane_ndim=3)
        block_ct = fresh_bitct(block_arr, ctx, lane_ndim=2)
        state_ct = block_ct ^ key_ct.reshape_lanes(16, 8)  # ARK0, eager
        state, st_meta = state_ct.array, (state_ct.noise_sq, state_ct.comps)

        def build0(mctx, base):
            prev = base.slice_lanes(slice(3, 4), axis=0).reshape_lanes(4, 8)
            return strategy.pipeline.key_schedule_group_preboot(
                mctx, base, prev, mctx.trivial_bits(rc_bits(1)))
        pre_meta = _shadow_bitct(ctx, build0, [key_ct])
    else:
        state = block_arr + key_arr
    pre = sub_fn(ctx.sks, group0, jnp.asarray(rc_bits(1)))

    groups = [group0]
    for g in range(1, 10):
        rc_np = rc_bits(g + 1)
        if track:
            def build(mctx, pre_ct, st_ct, rc_np=rc_np):
                nxt, st, _booted = strategy.pipeline.latency_fused_middle(
                    mctx, pre_ct, st_ct, mctx.trivial_bits(rc_np))
                return BitCt.concat_lanes([nxt.reshape_lanes(16, 8), st],
                                          axis=0)
            both = _shadow_bitct(ctx, build,
                                 [BitCt(pre, *pre_meta, ctx),
                                  BitCt(state, *st_meta, ctx)])
            pre_meta = (both[0][:16].reshape(4, 4, 8),
                        both[1][:16].reshape(4, 4, 8))
            st_meta = (both[0][16:], both[1][16:])
        pre, state, booted = mid_fn(ctx.sks, pre, state, jnp.asarray(rc_np))
        groups.append(booted)

    if track:
        out_meta = _shadow_bitct(
            ctx, lambda mctx, p, s: strategy.pipeline.latency_fused_final(
                mctx, p, s)[0],
            [BitCt(pre, *pre_meta, ctx), BitCt(state, *st_meta, ctx)])
    out, booted10 = fin_fn(ctx.sks, pre, state)
    groups.append(booted10)
    if batched:
        out = out[None]
    out_ct = (BitCt(out, *out_meta, ctx) if track
              else strategy.fresh(out, ctx, lane_ndim=2))
    if not return_eks:
        return out_ct
    # assemble the expanded key the scans computed anyway: group 0 is the
    # fresh key, groups 1..10 are identity-booted cbs outputs (nominal
    # noise, fresh components — same metadata key_schedule_staged produces)
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import _fresh_ids
    eks_arr = jnp.concatenate(groups, axis=0)
    if track:
        eks = BitCt(eks_arr,
                    np.concatenate([key_ct.noise_sq,
                                    np.ones((40, 4, 8), np.int64)], axis=0),
                    np.concatenate([key_ct.comps, _fresh_ids((40, 4, 8))],
                                   axis=0), ctx)
    else:
        eks = strategy.fresh(eks_arr, ctx, lane_ndim=3)
    return out_ct, eks


def _staged_rounds_scan(strategy, params, sks, state_arr, kgs_arr):
    """All middle rounds in ONE program: lax.scan over the stacked round
    keys. Each program dispatch through a tunneled accelerator pays a
    ~70-100ms floor, so 9 per-round dispatches cost ~0.7s/run; the scan body
    compiles once (same cost as a single round program)."""
    import jax.numpy as jnp

    ctx = strategy.make_context(params, sks)
    ops = strategy.make_ops(ctx)
    kw = {} if ops is None else {"ops": ops}

    def body(state_a, kg_a):
        state = strategy.fresh(state_a, ctx, lane_ndim=2)
        key_group = strategy.fresh(kg_a, ctx, lane_ndim=2)
        return strategy.pipeline.middle_round(ctx, state, key_group,
                                              **kw).array, None

    out, _ = jax.lax.scan(body, jnp.asarray(state_arr), kgs_arr)
    return out


def encrypt_blocks_staged(strategy, ctx, eks, blocks_arr, rounds: int,
                          blocks_meta=None):
    """AES rounds via two reused compiled kernels: one scan program covering
    all middle rounds + the final round program.

    On the production model the noise metadata is carried ACROSS the
    compiled-program boundaries: the first AddRoundKey runs as a real BitCt
    XOR (the same eager device add as before, plus the reference's always-on
    checks), every round is shadow-traced with its true incoming metadata
    before its program dispatches, and the returned BitCt carries the true
    end-to-end metadata — the served path validates exactly what the
    whole-program jit validates (shortint_woppbs_1bit.rs:134-142).

    blocks_meta: optional (noise_sq, comps) for non-fresh input blocks (the
    homomorphically derived CTR batch, aes_128/ctr_fhe.derived_blocks_meta)."""
    params = ctx.params
    blocks_arr = jnp.asarray(blocks_arr)
    fin_fn = _kernel(ctx, ("round_fin", jnp.shape(blocks_arr)), lambda: jax.jit(
        partial(_staged_round, strategy, params, True)))

    track = _tracks_meta(ctx)
    if track:
        if not isinstance(eks, BitCt):
            eks = fresh_bitct(jnp.asarray(eks), ctx, lane_ndim=3)
        eks_arr = eks.array
        kg_ct = lambda i: eks.slice_lanes(slice(4 * i, 4 * i + 4),
                                          axis=0).reshape_lanes(16, 8)
        blocks_ct = (BitCt(blocks_arr, blocks_meta[0], blocks_meta[1], ctx)
                     if blocks_meta is not None
                     else fresh_bitct(blocks_arr, ctx, lane_ndim=2))
        state_ct = blocks_ct ^ kg_ct(0)  # AddRoundKey (one eager add + checks)
        state, meta = state_ct.array, (state_ct.noise_sq, state_ct.comps)
    else:
        eks_arr = eks.array if hasattr(eks, "array") else jnp.asarray(eks)
        state = blocks_arr + eks_arr[0:4].reshape((16, 8) + eks_arr.shape[-1:])
    kg = lambda i: eks_arr[4 * i: 4 * i + 4].reshape((16, 8) + eks_arr.shape[-1:])

    def round_build(final):
        fn = (strategy.pipeline.final_round if final
              else strategy.pipeline.middle_round)
        return lambda mctx, s, kgc: fn(mctx, s, kgc,
                                       **_pipeline_kwargs(strategy, mctx))

    if rounds > 1:
        mids_fn = _kernel(
            ctx, ("rounds_scan", jnp.shape(blocks_arr), rounds),
            lambda: jax.jit(partial(_staged_rounds_scan, strategy, params)))
        kgs = jnp.stack([kg(i) for i in range(1, rounds)])
        if track:
            for i in range(1, rounds):
                meta = _shadow_bitct(ctx, round_build(False),
                                     [BitCt(state, *meta, ctx), kg_ct(i)])
        state = mids_fn(ctx.sks, state, kgs)
    if track:
        meta = _shadow_bitct(ctx, round_build(True),
                             [BitCt(state, *meta, ctx), kg_ct(10)])
    state = fin_fn(ctx.sks, state, kg(10))
    if track:
        return BitCt(state, *meta, ctx)
    return strategy.fresh(state, ctx, lane_ndim=2)


def make_key_schedule_fn(strategy, params):
    """Jitted (sks, key_cts [16,8,n1]) -> expanded key [44,4,8,n1]."""
    def fn(sks, key_arr):
        ctx = FheContext(params, sks)
        key = fresh_bitct(key_arr, ctx, lane_ndim=2)
        return strategy.pipeline.key_schedule(
            ctx, key, **_pipeline_kwargs(strategy, ctx)).array
    return jax.jit(fn)
