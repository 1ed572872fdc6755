"""Noise-floor limb-plane truncation criteria for the exact int8 contractions.

Every hot contraction in this framework multiplies small gadget digits against
a u64 tensor split into 8 balanced int8 limb planes (ops/torus.py). When that
u64 tensor is an *encryption* — an evaluation key or a runtime GGSW — its
coefficients carry Gaussian noise of std sigma, so limb planes whose total
weight sits far below sigma are indistinguishable from noise: dropping planes
0..js-1 replaces each coefficient x by x - (x mod 2^(8·js)), an extra
"truncation noise" uniform in ±2^(8·js-1), std 2^(8·js)/sqrt(12).

Unlike encryption noise — which lives only in the ciphertext *body* —
truncation also hits the *mask* coefficients, and a mask perturbation err_a
reaches the phase through the secret key: err_phase = err_b − <err_a, s>
(polynomially for GLWE rows). For a binary secret that multiplies the
truncation variance by the KEY AMPLIFICATION factor

    key_amp = 1 + dim/2      (dim = kN for GLWE-keyed rows, n for LWE)

— about 2^10 at production — exactly the factor in mod-switch noise
analyses. (Round-1 shipped without it; the 2026-08-19 measured noise
attribution, PERF.md "Production noise margin", found the end-to-end output
variance 127x the no-truncation baseline, split ~53% BSK / ~46% KSK+pfPKSK,
precisely this factor.) Two criteria then justify dropping a plane; js is
the max of the two arms, with key_amp included on the truncation side:

  sigma arm   key_amp·(2^(8·js))²/12 <= (sigma/safety)² — the truncation
              noise hides under the key's own (body-only) noise.
  budget arm  A·key_amp·(2^(8·js))²/12 <= frac · V_round — the *operation*
              that consumes the key adds gadget-decomposition rounding noise
              V_round regardless of the key; A is the factor mapping
              per-coefficient key variance into output variance (the same A
              multiplies sigma² in the standard bounds). Truncation up to
              the rounding floor rides noise the operation already pays.
              frac = TFHE_TRUNC_BUDGET (default 1.0).

  EXCEPTION — BSK: the blind-rotate key keeps js=2, which the key-amped
  budget arm does NOT cover (it allows js=1; js=2 exceeds it by ~2^9 in
  variance). It is retained because (a) it saves 2/13 of the CMux dots in
  the kernel that is ~90% of total runtime, and (b) the MEASURED end-to-end
  decode margin with it is 13.4σ (10.2σ before the KSK/pfPKSK backoff),
  above the reference parameter set's p≈5.4e-20 ≈ 9.1σ design point.
  noise_probe.py / tests/test_noise_margin.py guard this empirically; if
  the margin regresses below the bar, drop TFHE_BSK_TRUNC or lower this js
  first.

The reference (tfhe-rs f64 FFT) pays a similar *implicit* truncation: its
53-bit mantissa products round the low bits of every polynomial product; this
framework's arithmetic is exact, so the truncation here is an explicit,
noise-accounted choice rather than a floating-point accident.

Per-key noise floors at the production set (PARAMS_SQRD_LVL_64):

    key      sigma (torus units)     js  arm        int8 dots kept
    BSK      sigma_bsk ≈ 2^12         2  EXCEPTION  11/15  (blind-rotate CMux)
    KSK      sigma_lwe ≈ 2^49.6       5  sigma       3/8   (big->small KS)
    pfPKSK   sigma_pfks ≈ 2^12        1  budget     16/18  (pfKS)
    VP GGSW  nominal CBS out ≈ 2^40   4  budget      7/15  (vertical packing)

The VP entry: the GGSW selectors of vertical packing are *runtime data*
produced by circuit bootstrapping, whose noise (blind rotate + pfKS,
estimated nominally below) is ~2^24 times the BSK noise — so more than half
their limb planes are pure noise and the CMux-tree MXU work halves. Gates:
TFHE_BSK_TRUNC / TFHE_KSK_TRUNC / TFHE_VP_TRUNC (=0 disables; the gate
disables both arms).
"""

from __future__ import annotations

import math
import os

from tfhe_aes2_tpu.ops.params import WopbsParams

_Q = 2.0 ** 64
_SQRT12 = math.sqrt(12.0)


def truncate_u64_values(x, js: int):
    """Value-level equivalent of dropping balanced int8 limb planes 0..js-1.

    With torus.split_u64_signed's balanced base-256 split, dropping planes
    0..js-1 keeps Σ_{i>=js} p_i·2^(8i) = x - low where low = the balanced
    residue ((x + off) mod 2^(8js)) - off, off = Σ_{i<js} 2^(8i+7). This
    lets the CPU matmul path reproduce EXACTLY the arithmetic effect of the
    TPU kernels' plane-dropping (the always-on noise-floor regression test,
    tests/test_noise_floor.py); equivalence is pinned by
    tests/test_truncation.py::test_value_truncation_matches_plane_drop."""
    import jax.numpy as jnp

    from tfhe_aes2_tpu.ops.torus import U64

    x = jnp.asarray(x, U64)
    if js <= 0:
        return x
    off = jnp.uint64(sum(1 << (8 * i + 7) for i in range(js)))
    mask = jnp.uint64((1 << (8 * js)) - 1)
    low = ((x + off) & mask) - off
    return x - low


def j_start_for_sigma(sigma: float, safety: float = 8.0,
                      key_amp: float = 1.0) -> int:
    """Largest js in [0, 7] with key-amplified truncation std
    sqrt(key_amp)·2^(8·js)/sqrt(12) <= sigma/safety."""
    js = 0
    while js < 7 and (math.sqrt(key_amp) * (2.0 ** (8 * (js + 1))) / _SQRT12
                      <= sigma / safety):
        js += 1
    return js


def glwe_key_amp(params: WopbsParams) -> float:
    """Mask-plane truncation key amplification for GLWE-keyed rows
    (binary secret): 1 + kN/2."""
    return 1.0 + params.glwe_dimension * params.polynomial_size / 2.0


def lwe_key_amp(params: WopbsParams) -> float:
    """Mask-plane truncation key amplification for small-LWE-keyed rows."""
    return 1.0 + params.lwe_dimension / 2.0


def _gate(env: str) -> bool:
    return os.environ.get(env, "1") != "0"


def _budget_frac() -> float:
    return float(os.environ.get("TFHE_TRUNC_BUDGET", "1.0"))


def budget_sigma(v_round: float, amplification: float) -> float:
    """Largest per-coefficient truncation std whose amplified variance stays
    within frac·V_round (the budget arm: noise the operation pays anyway)."""
    frac = _budget_frac()
    return math.sqrt(frac * v_round / amplification) if frac > 0 else 0.0


def bsk_j_start(params: WopbsParams) -> int:
    """BSK planes dropped in the blind-rotate CMux kernels.

    DOCUMENTED EXCEPTION (module docstring): this criterion deliberately
    omits the key-amplification factor — with it the budget arm allows only
    js=1, while js=2 saves 2/13 of the dots in the kernel that is ~90% of
    total runtime. The resulting end-to-end decode margin is MEASURED at
    13.4σ (noise_probe.py, PERF.md "Production noise margin"), above the
    parameter set's p≈5.4e-20 ≈ 9.1σ design point; test_noise_margin guards
    the bar. If it ever regresses, lower this js before anything else.
    """
    if not _gate("TFHE_BSK_TRUNC"):
        return 0
    p = params
    sigma = max(p.glwe_noise_std * _Q / 32.0,
                budget_sigma(pbs_round_variance(p), pbs_amplification(p)))
    return j_start_for_sigma(sigma, safety=1.0)


def ksk_j_start(params: WopbsParams) -> int:
    """KSK planes dropped in the big->small keyswitch.

    The small-LWE key noise is huge (sigma ≈ 2^49.6 at production — the
    keyswitch is the noisiest step of WoP-PBS by design); with the mask-plane
    key amplification (1 + n/2) accounted, planes 0..4 sit below the noise
    floor: the keyswitch contraction needs 3 of its 8 int8 limb matmuls.
    (Round 1 used js=6 without the key-amp factor; the measured noise
    attribution showed that contributed ~half of a 127x output-variance
    inflation — see module docstring.)
    """
    if not _gate("TFHE_KSK_TRUNC"):
        return 0
    return j_start_for_sigma(params.lwe_noise_std * _Q, safety=8.0,
                             key_amp=lwe_key_amp(params))


def pfpksk_j_start(params: WopbsParams) -> int:
    """pfPKSK planes dropped in the pfKS contraction.

    sigma arm on the pfKS key noise plus the budget arm on the pfKS
    gadget-rounding term, both with the GLWE key-amplification factor
    (dominant arm at production: budget, js=1)."""
    if not _gate("TFHE_KSK_TRUNC"):
        return 0
    p = params
    sigma = max(p.pfks_noise_std * _Q / 8.0,
                budget_sigma(pfks_round_variance(p), pfks_amplification(p)))
    return j_start_for_sigma(sigma, safety=1.0, key_amp=glwe_key_amp(p))


# ---------------------------------------------------------------------------
# Nominal noise model for the circuit-bootstrap GGSW (the vertical-packing
# selector operands). Standard TFHE variance bounds (TFHE paper Thm 6.3 /
# tfhe-rs concrete-optimizer forms), dominant terms only — the result feeds a
# *byte-granular* threshold, so small constant factors cannot move js.
# ---------------------------------------------------------------------------


def pbs_amplification(params: WopbsParams) -> float:
    """Factor mapping per-coefficient BSK variance into PBS output variance
    (multiplies sigma_bsk² in the standard external-product bound)."""
    p = params
    n, big_n, k, l = (p.lwe_dimension, p.polynomial_size, p.glwe_dimension,
                      p.pbs_level)
    beta = 2.0 ** p.pbs_base_log
    return n * l * (k + 1) * big_n * (beta * beta / 12.0)


def pbs_round_variance(params: WopbsParams) -> float:
    """PBS gadget-decomposition rounding term (digits cover l·base_log bits)."""
    p = params
    eps = _Q / (2.0 * (2.0 ** p.pbs_base_log) ** p.pbs_level)
    return p.lwe_dimension * (1.0 + p.glwe_dimension * p.polynomial_size / 2.0) \
        * (eps * eps / 3.0)


def _trunc_var(js: int) -> float:
    """Per-coefficient variance of dropping limb planes 0..js-1."""
    return (2.0 ** (8 * js)) ** 2 / 12.0 if js else 0.0


def pbs_out_variance(params: WopbsParams) -> float:
    """Nominal variance of a scaling-PBS (blind rotate + extract) output,
    including the variance added by the active BSK plane truncation."""
    sigma_bsk = params.glwe_noise_std * _Q
    return pbs_amplification(params) \
        * (sigma_bsk ** 2
           + glwe_key_amp(params) * _trunc_var(bsk_j_start(params))) \
        + pbs_round_variance(params)


def pfks_amplification(params: WopbsParams) -> float:
    """Factor mapping per-coefficient pfPKSK variance into pfKS output variance."""
    p = params
    kn1 = p.glwe_dimension * p.polynomial_size + 1
    beta = 2.0 ** p.pfks_base_log
    return kn1 * p.pfks_level * (beta * beta / 12.0)


def pfks_round_variance(params: WopbsParams) -> float:
    """pfKS gadget-decomposition rounding term."""
    p = params
    kn1 = p.glwe_dimension * p.polynomial_size + 1
    eps = _Q / (2.0 * (2.0 ** p.pfks_base_log) ** p.pfks_level)
    return (kn1 - 1) * 0.5 * (eps * eps / 3.0)


def pfks_add_variance(params: WopbsParams) -> float:
    """Nominal variance the pfKS adds on top of its input LWE's noise,
    including the variance added by the active pfPKSK plane truncation."""
    sigma = params.pfks_noise_std * _Q
    return pfks_amplification(params) \
        * (sigma ** 2
           + glwe_key_amp(params) * _trunc_var(pfpksk_j_start(params))) \
        + pfks_round_variance(params)


def vp_amplification(params: WopbsParams) -> float:
    """Factor mapping per-coefficient GGSW variance into one VP CMux output
    (external product against one selector; per-step, like vp_round)."""
    p = params
    beta = 2.0 ** p.cbs_base_log
    return p.cbs_level * (p.glwe_dimension + 1) * p.polynomial_size \
        * (beta * beta / 12.0)


def vp_round_variance(params: WopbsParams) -> float:
    """Per-CMux gadget rounding in vertical packing (cbs_level digits)."""
    p = params
    eps = _Q / (2.0 * (2.0 ** p.cbs_base_log) ** p.cbs_level)
    return (1.0 + p.glwe_dimension * p.polynomial_size / 2.0) * (eps * eps / 3.0)


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
    p = params
    sigma = max(cbs_ggsw_sigma(p) / 8.0,
                budget_sigma(vp_round_variance(p), vp_amplification(p)))
    return j_start_for_sigma(sigma, safety=1.0, key_amp=glwe_key_amp(p))
