"""Noise-floor limb-plane truncation criteria for the exact int8 contractions.

Every hot contraction in this framework multiplies small gadget digits against
a u64 tensor split into 8 balanced int8 limb planes (ops/torus.py). When that
u64 tensor is an *encryption* — an evaluation key or a runtime GGSW — its
coefficients carry Gaussian noise of std sigma, so limb planes whose total
weight sits far below sigma are indistinguishable from noise: dropping planes
0..js-1 replaces each coefficient x by x - (x mod 2^(8·js)), an extra
"truncation noise" uniform in ±2^(8·js-1), std 2^(8·js)/sqrt(12).

Because that truncation error enters every downstream sum *exactly like the
coefficient's own noise* (multiplied by the same digits, accumulated over the
same terms), the safety criterion is purely relative:

    2^(8·js)/sqrt(12) <= sigma / safety   =>  variance grows by <= 1/safety².

The reference (tfhe-rs f64 FFT) pays a similar *implicit* truncation: its
53-bit mantissa products round the low bits of every polynomial product; this
framework's arithmetic is exact, so the truncation here is an explicit,
noise-accounted choice rather than a floating-point accident.

Per-key noise floors at the production set (PARAMS_SQRD_LVL_64):

    key      sigma (integer torus units)  js   int8 dots kept
    BSK      glwe_noise_std·2^64 ≈ 2^12    1   13/15  (blind-rotate CMux)
    KSK      lwe_noise_std·2^64  ≈ 2^49.6  6    2/8   (big->small keyswitch)
    pfPKSK   pfks_noise_std·2^64 ≈ 2^12    1   15/18  (pfKS)
    VP GGSW  nominal CBS output  ≈ 2^36    4    7/15  (vertical packing)

The VP entry is the interesting one: the GGSW selectors of vertical packing
are *runtime data* produced by circuit bootstrapping, whose noise (blind
rotate + pfKS, estimated nominally below) is ~2^24 times the BSK noise — so
more than half their limb planes are pure noise and the CMux-tree MXU work
halves. Gates: TFHE_BSK_TRUNC / TFHE_KSK_TRUNC / TFHE_VP_TRUNC (=0 disables).
"""

from __future__ import annotations

import math
import os

from tfhe_aes2_tpu.ops.params import WopbsParams

_Q = 2.0 ** 64
_SQRT12 = math.sqrt(12.0)


def j_start_for_sigma(sigma: float, safety: float = 8.0) -> int:
    """Largest js in [0, 7] with truncation std 2^(8·js)/sqrt(12) <= sigma/safety."""
    js = 0
    while js < 7 and (2.0 ** (8 * (js + 1))) / _SQRT12 <= sigma / safety:
        js += 1
    return js


def _gate(env: str) -> bool:
    return os.environ.get(env, "1") != "0"


def bsk_j_start(params: WopbsParams) -> int:
    """BSK planes dropped in the blind-rotate CMux kernels.

    safety=32 (variance +0.1%): the GGSW noise of the *scaling PBS* output is
    amplified by the vertical-packing digits (base 2^cbs_base_log), so the BSK
    floor is held tighter than the keyswitch keys'.
    """
    if not _gate("TFHE_BSK_TRUNC"):
        return 0
    return j_start_for_sigma(params.glwe_noise_std * _Q, safety=32.0)


def ksk_j_start(params: WopbsParams) -> int:
    """KSK planes dropped in the big->small keyswitch.

    The small-LWE key noise is huge (sigma ≈ 2^49.6 at production — the
    keyswitch is the noisiest step of WoP-PBS by design), so at production all
    of planes 0..5 sit below the noise floor: the keyswitch contraction needs
    only 2 of its 8 int8 limb matmuls.
    """
    if not _gate("TFHE_KSK_TRUNC"):
        return 0
    return j_start_for_sigma(params.lwe_noise_std * _Q, safety=8.0)


def pfpksk_j_start(params: WopbsParams) -> int:
    """pfPKSK planes dropped in the pfKS contraction (GLWE-level noise floor)."""
    if not _gate("TFHE_KSK_TRUNC"):
        return 0
    return j_start_for_sigma(params.pfks_noise_std * _Q, safety=8.0)


# ---------------------------------------------------------------------------
# Nominal noise model for the circuit-bootstrap GGSW (the vertical-packing
# selector operands). Standard TFHE variance bounds (TFHE paper Thm 6.3 /
# tfhe-rs concrete-optimizer forms), dominant terms only — the result feeds a
# *byte-granular* threshold, so small constant factors cannot move js.
# ---------------------------------------------------------------------------


def pbs_out_variance(params: WopbsParams) -> float:
    """Nominal variance of a scaling-PBS (blind rotate + extract) output."""
    p = params
    n, big_n, k, l = p.lwe_dimension, p.polynomial_size, p.glwe_dimension, p.pbs_level
    beta = 2.0 ** p.pbs_base_log
    sigma_bsk = p.glwe_noise_std * _Q
    # external-product BSK-noise term, per CMux step x n steps
    v_bsk = n * l * (k + 1) * big_n * (beta * beta / 12.0) * sigma_bsk ** 2
    # gadget-decomposition rounding term (digits cover l·base_log bits)
    eps = _Q / (2.0 * beta ** l)
    v_round = n * (1.0 + k * big_n / 2.0) * (eps * eps / 3.0)
    return v_bsk + v_round


def pfks_add_variance(params: WopbsParams) -> float:
    """Nominal variance the pfKS adds on top of its input LWE's noise."""
    p = params
    kn1 = p.glwe_dimension * p.polynomial_size + 1
    l = p.pfks_level
    beta = 2.0 ** p.pfks_base_log
    sigma = p.pfks_noise_std * _Q
    v_key = kn1 * l * (beta * beta / 12.0) * sigma ** 2
    eps = _Q / (2.0 * beta ** l)
    v_round = (kn1 - 1) * 0.5 * (eps * eps / 3.0)
    return v_key + v_round


def cbs_ggsw_sigma(params: WopbsParams) -> float:
    """Nominal noise std of the circuit-bootstrap GGSW rows (PBS then pfKS)."""
    return math.sqrt(pbs_out_variance(params) + pfks_add_variance(params))


def vp_ggsw_j_start(params: WopbsParams) -> int:
    """GGSW planes dropped in the vertical-packing CMux kernels.

    These operands are runtime ciphertexts out of circuit bootstrapping; their
    noise floor is set by the accumulated blind-rotate + pfKS noise, ~2^36 at
    production — planes 0..3 are noise, and the CMux-tree MXU work halves.
    """
    if not _gate("TFHE_VP_TRUNC"):
        return 0
    return j_start_for_sigma(cbs_ggsw_sigma(params), safety=8.0)
