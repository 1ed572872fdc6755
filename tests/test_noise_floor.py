"""Always-on production noise-floor regression net (CPU, default suite).

The reference builds with `noise-asserts` so noise violations fail every run
(Cargo.toml:10). The TPU equivalent here measures the REAL decrypted
phase-error distribution at PRODUCTION parameters (PARAMS_SQRD_LVL_64) with
every limb-plane truncation active — including the one deliberately
out-of-model constant in the system, the BSK js=2 exception
(ops/truncation.py) — in every `pytest tests/ -q` run, not only behind the
opt-in TPU probe (tests/test_noise_margin.py).

The TPU kernels drop limb planes structurally (pallas); on the CPU matmul
path the same arithmetic is reproduced EXACTLY by value-level truncation of
the key tensors (truncation.truncate_u64_values — equivalence pinned by
test_truncation.py::test_value_truncation_matches_plane_drop). The measured
path is the complete noise-relevant pipeline of an AES round's SBOX: big->
small keyswitch (KSK js), scaling PBS (BSK js), pfKS (pfPKSK js), and the
vertical-packing 8->24 gal-mul lookup (VP GGSW js); the round's linear layer
adds only the XOR variance already covered by the metadata tests.

Calibration (2026-08-20, 16 bytes): output log2(std) 58.40 on this CPU path
vs 58.25 measured end-to-end on the TPU (PERF.md "Production noise margin")
— the emulation reproduces the production distribution. Runtime at 4 bytes:
~2 min (the VERDICT-prescribed budget for an always-on production check).
"""

import os

import numpy as np
import pytest

from tfhe_aes2_tpu.aes_128 import SBOX, gf_256_mul
from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs
from tfhe_aes2_tpu.ops import keys as keys_mod
from tfhe_aes2_tpu.ops import keyswitch as ks
from tfhe_aes2_tpu.ops import truncation
from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64


def _sbox_gal_mul(b: int) -> int:
    return ((gf_256_mul(int(SBOX[b]), 1) << 16)
            | (gf_256_mul(int(SBOX[b]), 2) << 8)
            | gf_256_mul(int(SBOX[b]), 3))


def _measure_noise_floor(params, dual_bar: float, out_bar: float, keys=None):
    """One production-geometry SBOX circuit bootstrap with ALL truncations
    active: decode must be exact and the phase-error stds must clear the
    given bars (log2 std). `keys` reuses a session-cached (client, sks)
    (tests/test_params_all_sets.py runs this for every reference set)."""
    import jax.numpy as jnp

    client, sks = keys if keys is not None else keys_mod.generate_keys(
        params, seed=5)

    js_bsk = truncation.bsk_j_start(params)
    js_ksk = truncation.ksk_j_start(params)
    js_pf = truncation.pfpksk_j_start(params)
    js_vp = truncation.vp_ggsw_j_start(params)

    sks_t = sks._replace(
        bsk=np.asarray(truncation.truncate_u64_values(sks.bsk, js_bsk)),
        ksk=np.asarray(truncation.truncate_u64_values(sks.ksk, js_ksk)),
        pfpksk=np.asarray(truncation.truncate_u64_values(sks.pfpksk, js_pf)))

    byte_vals = np.array([0x53, 0x00, 0xFF, 0xC2], np.uint8)
    bits = np.unpackbits(byte_vals[:, None], axis=-1)          # [4, 8] MSB 1st
    cts = client.encrypt_bits(bits)                            # big key

    # big->small keyswitch (the noisiest step by design; guards KSK js)
    dual = np.asarray(ks.keyswitch(jnp.asarray(cts),
                                   jnp.asarray(sks_t.ksk), params))
    ph_dual = client.decrypt_phase_small(dual)
    err_dual = (ph_dual - (bits.astype(np.uint64) << np.uint64(63))
                ).astype(np.int64).astype(np.float64)
    dec_dual = (((ph_dual + np.uint64(1 << 62)) >> np.uint64(63))
                & np.uint64(1)).astype(np.uint8)
    assert (dec_dual == bits).all(), "dual bits decode failed"
    assert np.log2(err_dual.std()) <= dual_bar, np.log2(err_dual.std())

    # scaling PBS (BSK js) + pfKS (pfPKSK js) -> GGSW, then vertical
    # packing of the production 8->24 LUT (VP GGSW js)
    lut = cbs.generate_lut(8, 24, _sbox_gal_mul, params)
    ggsw = cbs.circuit_bootstrap_bits_small(jnp.asarray(dual), sks_t, params)
    ggsw_t = truncation.truncate_u64_values(ggsw, js_vp)
    out = np.asarray(cbs.vertical_packing(ggsw_t, jnp.asarray(lut), params,
                                          use_conv="matmul"))

    ph = client.decrypt_phase(out)                             # [4, 24]
    exp_bits = np.array([[(_sbox_gal_mul(int(b)) >> (23 - o)) & 1
                          for o in range(24)] for b in byte_vals], np.uint64)
    dec = (((ph + np.uint64(1 << 62)) >> np.uint64(63)) & np.uint64(1))
    assert (dec == exp_bits).all(), "SBOX+GalMul outputs decode failed"

    err = (ph - (exp_bits << np.uint64(63))).astype(np.int64).astype(np.float64)
    log2_std = np.log2(err.std())
    assert log2_std <= out_bar, log2_std
    return (js_bsk, js_ksk, js_pf, js_vp), np.log2(err_dual.std()), log2_std


def test_production_noise_floor():
    # the shipped production constants (PERF.md "Production noise margin");
    # a criteria change shows up here before it shows up as a decode failure.
    # dual bar: measured log2(std) 57.1 vs the 2^62 threshold (+8x variance
    # headroom at 58.6). out bar: measured 58.40 at 16 bytes / 58.3±0.2 at
    # 4; the depth-5 XOR that follows in a round multiplies variance by <=5
    # (+1.2 bits) against the 2^62 decode threshold, so 59.2 keeps >=5.5
    # sigma end-to-end and fails on any >3x variance regression (one js
    # step is 2^16x).
    js, _, _ = _measure_noise_floor(PARAMS_SQRD_LVL_64,
                                    dual_bar=58.6, out_bar=59.2)
    assert js == (2, 5, 1, 4)


@pytest.mark.skipif(os.environ.get("TFHE_MXU_PROBE") != "1",
                    reason="exploratory MXU-geometry probe; the default "
                           "suite pins the shipped lvl64 set")
def test_noise_floor_mxu_geometry():
    """The TPU-first k=8/N=256 re-optimization (PARAMS_SQRD_LVL_64_MXU):
    same measurement at the alternative geometry. The coarser Z_{2N}
    mod-switch raises the dual error (~2^57.6 predicted vs 57.1); bars keep
    the same absolute margins as the production test."""
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64_MXU
    js, dual, out = _measure_noise_floor(PARAMS_SQRD_LVL_64_MXU,
                                         dual_bar=58.6, out_bar=59.2)
    print(f"mxu geometry: js={js} dual_log2std={dual:.2f} out_log2std={out:.2f}")
