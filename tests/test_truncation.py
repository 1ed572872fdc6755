"""Noise-floor limb-plane truncation (ops/truncation.py).

The reference pays an implicit version of this through its f64 FFT's 53-bit
mantissa (every polynomial product rounds its low bits); here the truncation
is explicit and noise-accounted, so these tests pin (a) the per-key criteria
at the production parameters, (b) the exact semantics of a truncated
contraction, and (c) end-to-end decode correctness with truncation active.
"""

import math

import numpy as np
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import blind_rotate as br
from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs
from tfhe_aes2_tpu.ops import decomposition
from tfhe_aes2_tpu.ops import keys as keys_mod
from tfhe_aes2_tpu.ops import keyswitch as ks
from tfhe_aes2_tpu.ops import truncation
from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64, PARAMS_TEST
from tfhe_aes2_tpu.ops.torus import exact_matmul, split_u64_signed


def test_value_truncation_matches_plane_drop():
    """truncate_u64_values(x, js) == recombining split_u64_signed(x)[js:] —
    the CPU noise-floor test (test_noise_floor.py) relies on this exact
    equivalence to reproduce the TPU kernels' plane-dropping on the matmul
    path."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 64, (64,), dtype=np.uint64)
    x[:4] = [0, (1 << 64) - 1, 1 << 63, 0x8080808080808080]
    for js in (0, 1, 2, 4, 5, 7):
        planes = np.asarray(split_u64_signed(jnp.asarray(x)))
        kept = sum((planes[i].astype(np.int64).astype(np.uint64)
                    << np.uint64(8 * i)) for i in range(js, 8))
        got = np.asarray(truncation.truncate_u64_values(jnp.asarray(x), js))
        assert (got == kept).all(), js


def test_production_criteria():
    """Pin the production truncation levels (documented in truncation.py).

    The criteria carry the mask-plane key-amplification factor (1 + dim/2);
    BSK js=2 is the documented exception (budget arm without key-amp),
    retained on the measured 13.4σ end-to-end margin (noise_probe.py)."""
    p = PARAMS_SQRD_LVL_64
    assert truncation.bsk_j_start(p) == 2   # documented exception (budget arm)
    assert truncation.ksk_j_start(p) == 5   # sigma arm + LWE key amplification
    assert truncation.pfpksk_j_start(p) == 1  # budget arm + GLWE key amp
    assert truncation.vp_ggsw_j_start(p) == 4
    # the nominal CBS GGSW noise (truncation terms included) sits far above
    # the BSK noise and far below the decode threshold
    sigma = truncation.cbs_ggsw_sigma(p)
    assert 2.0 ** 36 < sigma < 2.0 ** 42   # ~2^40.6: BSK truncation key-amped
    # the budget arm's whole premise, pinned: rounding dominates key noise
    assert truncation.pbs_round_variance(p) > \
        8 * truncation.pbs_amplification(p) * (p.glwe_noise_std * 2.0 ** 64) ** 2
    # and the VP decode margin survives: the nominal model (which measured
    # ~2^3 pessimistic end-to-end — PERF.md "Production noise margin",
    # observed 13.4σ) still clears the 8σ line against the 2^62 quarter-gap
    v_vp = (truncation.vp_amplification(p) * sigma ** 2
            + truncation.vp_round_variance(p)) * 8  # 8-deep tree
    assert math.sqrt(v_vp) < 2.0 ** 62 / 8


def test_gates_disable(monkeypatch):
    p = PARAMS_SQRD_LVL_64
    monkeypatch.setenv("TFHE_KSK_TRUNC", "0")
    monkeypatch.setenv("TFHE_VP_TRUNC", "0")
    monkeypatch.setenv("TFHE_BSK_TRUNC", "0")
    assert truncation.ksk_j_start(p) == 0
    assert truncation.pfpksk_j_start(p) == 0
    assert truncation.vp_ggsw_j_start(p) == 0
    assert truncation.bsk_j_start(p) == 0


def test_exact_matmul_truncated_semantics():
    """m_j_start drops exactly the low limb planes: the result equals the
    exact contraction against m with its low 8·js bits (balanced-rounded)
    removed."""
    rng = np.random.default_rng(5)
    d = rng.integers(-100, 101, size=(4, 16)).astype(np.int32)
    m = rng.integers(0, 1 << 64, size=(16, 8), dtype=np.uint64)
    js = 5
    planes = np.asarray(split_u64_signed(jnp.asarray(m)))      # [8, 16, 8] int8
    with np.errstate(over="ignore"):
        m_trunc = sum(
            (planes[j].astype(np.int64).astype(np.uint64)) << np.uint64(8 * j)
            for j in range(js, 8))
        want = np.zeros((4, 8), np.uint64)
        for b in range(4):
            for o in range(8):
                want[b, o] = np.sum(
                    d[b].astype(np.int64).astype(np.uint64) * m_trunc[:, o],
                    dtype=np.uint64)
    got = np.asarray(exact_matmul(jnp.asarray(d), jnp.asarray(m), 128,
                                  max_k=16, m_j_start=js))
    np.testing.assert_array_equal(got, want)
    # prepared-planes form agrees
    got2 = np.asarray(exact_matmul(jnp.asarray(d), jnp.asarray(planes[js:]),
                                   128, max_k=16, m_j_start=js))
    np.testing.assert_array_equal(got2, want)


def test_keyswitch_truncated_prepared(keys_test):
    """Keyswitch through noise-floor-truncated prepared KSK planes still
    decodes, and its deviation from the exact keyswitch stays far below the
    small-key noise (the criterion's whole claim)."""
    client, sks = keys_test
    p = client.params
    js = truncation.ksk_j_start(p)
    assert js >= 1, "test params should activate KSK truncation"
    bits = np.array([0, 1, 1, 0, 1, 0, 1, 1])
    cts = jnp.asarray(client.encrypt_bits(bits))

    exact = np.asarray(ks.keyswitch(cts, jnp.asarray(sks.ksk), p))
    planes = split_u64_signed(jnp.asarray(sks.ksk))[js:]
    trunc = np.asarray(ks.keyswitch(cts, planes, p))

    def phase(out):
        with np.errstate(over="ignore"):
            return out[..., -1] - (out[..., :-1] * client.lwe_sk).sum(
                axis=-1, dtype=np.uint64)

    dec = ((phase(trunc) + np.uint64(1 << 62)) >> np.uint64(63)) & np.uint64(1)
    np.testing.assert_array_equal(dec, bits)
    diff = (phase(trunc) - phase(exact)).astype(np.int64)
    sigma_lwe = p.lwe_noise_std * 2.0 ** 64
    # truncation deviation must sit below the key noise (criterion: std <= sigma/8)
    assert np.abs(diff).max() < 8 * sigma_lwe


def test_vertical_packing_truncated_pallas(keys_test):
    """CBS + vertical packing with the truncated pallas kernels (interpret
    mode on CPU) computes the same LUT outputs as the exact matmul path."""
    client, sks = keys_test
    p = client.params
    assert truncation.vp_ggsw_j_start(p) >= 1, \
        "test params should activate VP truncation"
    t, o = 4, 3
    value = 0b1011
    bits = np.array([(value >> (t - 1 - i)) & 1 for i in range(t)])
    cts = jnp.asarray(client.encrypt_bits(bits))
    lut = cbs.generate_lut(t, o, lambda v: (3 * v + 1) % (1 << o), p)

    ggsw = cbs.circuit_bootstrap_bits(cts, sks, p)
    out_pallas = np.asarray(cbs.vertical_packing(
        ggsw, jnp.asarray(lut), p, use_conv="pallas"))
    out_exact = np.asarray(cbs.vertical_packing(
        ggsw, jnp.asarray(lut), p, use_conv="matmul"))

    want = (3 * value + 1) % (1 << o)
    for out in (out_pallas, out_exact):
        got_bits = client.decrypt_bits(out)
        got = sum(int(b) << (o - 1 - i) for i, b in enumerate(got_bits))
        assert got == want


def test_bsk_j_start_general(keys_test):
    """The generalized BSK criterion activates js=2 at the test parameters
    (sigma_bsk = 2^24) and the blind-rotate kernels handle it: a scaling PBS
    through the prepared (truncated) BSK still decodes every bit."""
    client, sks = keys_test
    p = client.params
    assert truncation.bsk_j_start(p) == 2
    bits = np.array([0, 1, 1, 0])
    cts = jnp.asarray(client.encrypt_bits(bits))
    dual = ks.keyswitch(cts, jnp.asarray(sks.ksk), p)
    prepared = br.prepare_bsk(jnp.asarray(sks.bsk), p)
    assert prepared.shape[3] == 8 - 2
    out = np.asarray(br.pbs_bit_to_level(dual, prepared, p.cbs_base_log, p))
    with np.errstate(over="ignore"):
        phase = out[..., -1] - (out[..., :-1] * client.big_sk).sum(
            axis=-1, dtype=np.uint64)
    shift = 64 - p.cbs_base_log            # bit scaled to 2^(64-target_log)
    dec = ((phase + np.uint64(1 << (shift - 1))) >>
           np.uint64(shift)) & np.uint64(1)
    np.testing.assert_array_equal(dec, bits)
