"""FHE AES tests (mirrors reference test_helper.rs).

test_light: 2 rounds, key schedule computed in the clear then FHE-encrypted,
compared against the plain partial-round oracle (test_helper.rs:94-120).
Uses the small (insecure, fast) test parameter set on the CPU backend; the
production parameter sets run in bench.py / test_full on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod
from tfhe_aes2_tpu.aes_128 import fhe_encryption, plain
from tfhe_aes2_tpu.models import shortint_woppbs_1bit as model
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext, NoiseError
from tfhe_aes2_tpu.ops.params import PARAMS_TEST_N256


@pytest.fixture(scope="module")
def ctx_and_client(keys_test_n256):
    client, sks = keys_test_n256
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    return client, FheContext(params=client.params, sks=sks_dev)


def _test_light(client, ctx, strategy, rounds=2, n_blocks=1):
    rng = np.random.default_rng(42)
    key = rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
    blocks = [rng.integers(0, 256, 16, dtype=np.uint8).tobytes()
              for _ in range(n_blocks)]

    ks_clear = plain.key_schedule(key)
    ks_ct = fhe_encryption.encrypt_word_array(client, ks_clear)
    block_cts = fhe_encryption.encrypt_blocks(client, blocks)

    fn = fhe_mod.make_encrypt_blocks_fn(strategy, client.params, rounds)
    out = np.asarray(fn(ctx.sks, jnp.asarray(ks_ct), jnp.asarray(block_cts)))

    got = fhe_encryption.decrypt_blocks(client, out)
    expect = plain.expand_key_and_encrypt_blocks(key, blocks, rounds)
    assert got == expect


def test_light_gal_mul(ctx_and_client):
    """fhe_impls/shortint_woppbs_1bit.rs:186-193 equivalent."""
    client, ctx = ctx_and_client
    _test_light(client, ctx, fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt)


def test_light_gal_mul_batch2(ctx_and_client):
    client, ctx = ctx_and_client
    _test_light(client, ctx, fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt,
                n_blocks=2)


def test_light_sbox_pbs_pipeline_a(keys_test_n256):
    """Pipeline A (leveled Galois mul, depth-11) with a 256 noise budget.

    The reference #[ignore]s this pairing ("noise is not independent",
    fhe_impls/shortint_woppbs_1bit.rs:160-169); our per-lane trace-time
    tracker finds no genuine violation and decryption verifies correct —
    a capability improvement over the reference.
    """
    import dataclasses
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops.params import PARAMS_TEST_N256

    p256 = dataclasses.replace(PARAMS_TEST_N256, max_noise_level_squared=256)
    client, sks = keys_mod.generate_keys(p256, seed=7)
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    ctx = FheContext(params=p256, sks=sks_dev)
    _test_light(client, ctx, fhe_mod.ShortintWoppbs1BitSboxPbsAesEncrypt)


def test_xor_noise_overflow_raises(ctx_and_client):
    """Mirrors shortint_woppbs_1bit.rs:505-518 (#[should_panic] NoiseTooBig):
    XOR accumulation past max_noise_level_squared must fail."""
    client, ctx = ctx_and_client
    cts = [model.fresh_bitct(jnp.asarray(client.encrypt_bits(np.array([i & 1]))), ctx)
           for i in range(80)]
    acc = cts[0]
    with pytest.raises(NoiseError, match="NoiseTooBig"):
        for c in cts[1:]:
            acc = acc ^ c


def test_xor_not_independent_raises(ctx_and_client):
    """Mirrors shortint_woppbs_1bit.rs:520-529: XOR of a ciphertext with
    itself must fail the independence check."""
    client, ctx = ctx_and_client
    ct = model.fresh_bitct(jnp.asarray(client.encrypt_bits(np.array([1]))), ctx)
    with pytest.raises(NoiseError, match="not independent"):
        _ = ct ^ ct


def test_noise_probe_empirical(ctx_and_client):
    """Empirical counterpart of the reference's noise-independence probe
    (shortint_woppbs_1bit.rs:699-750): measure REAL phase noise after
    bootstraps and XOR chains and check it against the variance model.

    - a fresh bootstrap output has ~NOMINAL noise (noise_level_squared 1·T)
    - XOR of two INDEPENDENT bootstrap outputs ~doubles the variance
      (the independence heuristic the tracker assumes)
    """
    client, ctx = ctx_and_client
    rng = np.random.default_rng(9)
    n_lanes = 64
    bits = rng.integers(0, 2, (n_lanes, 1))
    ct = model.fresh_bitct(jnp.asarray(client.encrypt_bits(bits)), ctx,
                           lane_ndim=2)

    ident = ctx.generate_lookup_table(1, 1, lambda v: v)
    booted_a = ctx.circuit_bootstrap(ct, ident)
    booted_b = ctx.circuit_bootstrap(booted_a, ident)

    def measured_var(bitct, expect_bits):
        phase = client.decrypt_phase(np.asarray(bitct.array))
        err = (phase - (np.asarray(expect_bits, np.uint64) << np.uint64(63))
               ).astype(np.int64).astype(np.float64)
        return float(np.mean(err * err))

    var_a = measured_var(booted_a, bits)
    var_b = measured_var(booted_b, bits)
    # both are 1-input bootstraps: same NOMINAL output noise model
    assert 0.2 < var_a / var_b < 5.0

    # XOR of bootstraps of two INDEPENDENT encryptions of the same bits:
    # tracker says noise_level_squared doubles; the real variance should
    # roughly double too (the independence heuristic, eprint 2016/870)
    ct2 = model.fresh_bitct(jnp.asarray(client.encrypt_bits(bits)), ctx,
                            lane_ndim=2)
    booted_c = ctx.circuit_bootstrap(ct2, ident)
    x = booted_a ^ booted_c
    assert int(x.noise_sq.max()) == 2
    var_x = measured_var(x, np.zeros_like(bits))
    ratio = var_x / var_a
    assert 1.2 < ratio < 3.2, f"XOR variance ratio {ratio} (expected ~2)"

    # Known blind spot shared with the reference's id-based checker:
    # bootstrapping is deterministic, so bootstrapping the SAME ciphertext
    # twice yields bit-identical outputs; both trackers assign fresh ids and
    # allow the XOR, but the true noise amplitudes ADD (variance x4, not x2).
    # The AES pipelines never do this (every bootstrap input differs); the
    # probe documents the heuristic's limit like the reference's empirical
    # noise test (shortint_woppbs_1bit.rs:699-750).
    booted_dup = ctx.circuit_bootstrap(ct, ident)
    x_dup = booted_a ^ booted_dup
    var_dup = measured_var(x_dup, np.zeros_like(bits))
    ratio_dup = var_dup / var_a
    assert 3.0 < ratio_dup < 5.0, f"correlated ratio {ratio_dup} (expected ~4)"
