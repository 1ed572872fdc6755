"""Staged-path noise metadata threading (aes_128/fhe.py).

The served execution path (what bench.py and the CLI run) must carry the
reference's always-on variance + independence accounting across its
compiled-program boundaries — the reference validates every XOR of every
real execution (shortint_woppbs_1bit.rs:63-78,134-142). These tests pin
that the staged path's threaded metadata equals the whole-program jit
path's metadata (VERDICT r2 missing #1) and that the checks actually fire
on the served path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod, fhe_encryption, plain
from tfhe_aes2_tpu.aes_128.scenario import ctr_blocks
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import (
    BitCt, FheContext, NoiseError, _fresh_ids, fresh_bitct)

STRATEGY = fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt


def _ctx(keys):
    client, sks = keys
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    return client, FheContext(params=client.params, sks=sks_dev)


def _sizes(comps):
    return np.frompyfunc(len, 1, 1)(comps).astype(np.int64)


def test_staged_meta_matches_whole_program(keys_test):
    """After a staged FHE key schedule + 2 staged rounds, the threaded
    metadata (noise variance AND component-set structure) equals the
    whole-program path's — and the arrays still decrypt correctly."""
    client, ctx = _ctx(keys_test)
    key = bytes(range(16))
    key_ct = fhe_encryption.encrypt_byte_array(client, key)
    blocks = ctr_blocks(bytes(8), 2)
    block_cts = fhe_encryption.encrypt_blocks(client, blocks)

    eks = fhe_mod.key_schedule_staged(STRATEGY, ctx, jnp.asarray(key_ct))
    assert isinstance(eks, BitCt), "staged key schedule must carry metadata"
    assert eks.noise_sq.shape == (44, 4, 8)
    # every word ends at nominal noise: group 0 is the raw fresh key, later
    # groups are identity-booted (T=1 bootstrap) — the shadow validated the
    # intra-group XOR accumulations on the way (noise peaks at 12 inside a
    # group before the boot, fhe_sbox_pbs.rs:150-154 grouping)
    assert (eks.noise_sq == 1).all()

    out = fhe_mod.encrypt_blocks_staged(STRATEGY, ctx, eks,
                                        jnp.asarray(block_cts), 2)
    assert isinstance(out, BitCt)

    ref_noise, ref_comps = fhe_mod.whole_program_meta(
        STRATEGY, ctx,
        fresh_bitct(jnp.asarray(key_ct), ctx, lane_ndim=2),
        fresh_bitct(jnp.asarray(block_cts), ctx, lane_ndim=2), 2)

    assert np.array_equal(out.noise_sq, ref_noise)
    assert np.array_equal(_sizes(out.comps), _sizes(ref_comps))

    got = fhe_encryption.decrypt_blocks(client, np.asarray(out.array))
    expect = plain.expand_key_and_encrypt_blocks(key, blocks, 2)
    assert got == expect


def test_latency_path_matches_whole_program(keys_test):
    """The single-block latency path (11 fused scans covering key expansion
    AND all ten rounds, fhe.encrypt_block_latency) decrypts identically to
    the oracle and threads the same metadata as the whole-program jit."""
    client, ctx = _ctx(keys_test)
    key = bytes(range(16))
    key_ct = fhe_encryption.encrypt_byte_array(client, key)
    blocks = ctr_blocks(bytes(8), 1)
    block_cts = fhe_encryption.encrypt_blocks(client, blocks)

    out = fhe_mod.encrypt_block_latency(STRATEGY, ctx, jnp.asarray(key_ct),
                                        jnp.asarray(block_cts))
    assert isinstance(out, BitCt)
    got = fhe_encryption.decrypt_blocks(client, np.asarray(out.array))
    assert got == plain.expand_key_and_encrypt_blocks(key, blocks, 10)

    ref_noise, ref_comps = fhe_mod.whole_program_meta(
        STRATEGY, ctx,
        fresh_bitct(jnp.asarray(key_ct), ctx, lane_ndim=2),
        fresh_bitct(jnp.asarray(block_cts), ctx, lane_ndim=2), 10)
    assert np.array_equal(out.noise_sq, ref_noise)
    assert np.array_equal(_sizes(out.comps), _sizes(ref_comps))


def test_staged_first_ark_noise_budget_fires(keys_test):
    """The served path's first AddRoundKey validates the noise budget (the
    reference's NoiseTooBig panic) BEFORE any program dispatches."""
    client, ctx = _ctx(keys_test)
    block_cts = fhe_encryption.encrypt_blocks(client, ctr_blocks(bytes(8), 1))
    eks_arr = jnp.zeros((44, 4, 8, ctx.params.big_lwe_dimension + 1),
                        jnp.uint64)
    over = np.full((16, 8), ctx.params.max_noise_level_squared, np.int64)
    with pytest.raises(NoiseError, match="NoiseTooBig"):
        fhe_mod.encrypt_blocks_staged(
            STRATEGY, ctx, eks_arr, jnp.asarray(block_cts), 2,
            blocks_meta=(over, _fresh_ids((16, 8))))


def test_staged_first_ark_independence_fires(keys_test):
    """XORing the blocks with key material sharing their noise components
    raises the reference's 'noise components not independent' panic on the
    served path."""
    client, ctx = _ctx(keys_test)
    block_cts = fhe_encryption.encrypt_blocks(client, ctr_blocks(bytes(8), 1))
    blocks_ct = fresh_bitct(jnp.asarray(block_cts), ctx, lane_ndim=2)
    # an expanded key whose group-0 metadata aliases the blocks' components
    eks = BitCt(
        jnp.zeros((44, 4, 8, ctx.params.big_lwe_dimension + 1), jnp.uint64),
        np.ones((44, 4, 8), np.int64),
        np.concatenate([blocks_ct.comps.reshape(4, 4, 8),
                        _fresh_ids((40, 4, 8))], axis=0),
        ctx)
    with pytest.raises(NoiseError, match="not independent"):
        fhe_mod.encrypt_blocks_staged(
            STRATEGY, ctx, eks, blocks_ct.array, 2,
            blocks_meta=(blocks_ct.noise_sq, blocks_ct.comps))


def test_shadow_round_meta_is_cheap_and_correct(keys_test):
    """One shadow middle round: bootstrap outputs carry noise=8 (T=8 input
    bits), MixColumns XOR-combines 4 of them (+ key) — the depth-5 budget
    structure of the production pipeline (README.md:32-35)."""
    client, ctx = _ctx(keys_test)
    n1 = ctx.params.big_lwe_dimension + 1
    state = fresh_bitct(jnp.zeros((16, 8, n1), jnp.uint64), ctx, lane_ndim=2)
    kg = fresh_bitct(jnp.zeros((16, 8, n1), jnp.uint64), ctx, lane_ndim=2)
    noise, comps = fhe_mod._shadow_bitct(
        ctx,
        lambda mctx, s, k: STRATEGY.pipeline.middle_round(mctx, s, k),
        [state, kg])
    # 4 bootstrap outputs (noise 8 each) + fresh key bit = 33
    assert noise.shape == (16, 8)
    assert (noise == 4 * 8 + 1).all()
    assert (_sizes(comps) == 5).all()
