"""Circuit bootstrapping + vertical-packing CMux-tree lookup (WoP-PBS core).

TPU-native equivalent of tfhe-rs `circuit_bootstrapping_vertical_packing`
(reference call site shortint_woppbs_1bit.rs:328; algorithm from
eprint 2017/430): each input bit becomes a GGSW via `cbs_level` scaling
bootstraps + k+1 private functional keyswitches, then the multivalued LUT is
evaluated with a CMux tree over packed LUT polynomials and a final
CMux-rotation stage, one polynomial per output bit.

The reference notes the per-bit GGSW bootstraps run serially inside tfhe-rs
(README.md:70-71); here all bits of all bytes in the batch bootstrap together
through one batched blind rotation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.ops import blind_rotate as br
from tfhe_aes2_tpu.ops import keyswitch as ks
from tfhe_aes2_tpu.ops import polynomial
from tfhe_aes2_tpu.ops.keys import ServerKeySet
from tfhe_aes2_tpu.ops.params import WopbsParams
from tfhe_aes2_tpu.ops.torus import U64, encode_bit


def circuit_bootstrap_bits(bits_big, sks: ServerKeySet, params: WopbsParams):
    """LWE bits [..., kN+1] (bit at 2^63, big key) -> GGSW [..., L, k+1, k+1, N].

    Pipeline per bit (all batched): big->small keyswitch ("extract dual bit",
    shortint_woppbs_1bit.rs:339-363), then per cbs level a scaling PBS, then
    k+1 pfKS to assemble the GGSW rows.
    """
    dual = ks.keyswitch(bits_big, sks.ksk, params)                 # [..., n+1]
    return circuit_bootstrap_bits_small(dual, sks, params)


def circuit_bootstrap_bits_small(dual, sks: ServerKeySet, params: WopbsParams):
    """Like circuit_bootstrap_bits but for bits already under the small key
    (the 8-bit model feeds extracted bits directly,
    shortint_woppbs_8bit.rs:299-335)."""
    p = params
    rows_per_level = []
    for j in range(p.cbs_level):
        target_log = p.cbs_base_log * (j + 1)
        lwe_j = br.pbs_bit_to_level(dual, sks.bsk, target_log, p)  # [..., kN+1]
        rows_per_level.append(ks.pfks_all(lwe_j, sks.pfpksk, p))   # [..., k+1, k+1, N]
    return jnp.stack(rows_per_level, axis=-4)                      # [..., L, k+1, k+1, N]


def ggsw_to_rows(ggsw):
    """[..., L, k+1(row u), k+1, N] -> [..., (k+1)·L (r = u·L + l), k+1, N]
    matching blind_rotate.decompose_glwe's row order."""
    *batch, l, k1, _, n = ggsw.shape
    g = jnp.moveaxis(ggsw, -4, -3)                                 # [..., k+1, L, k+1, N]
    return g.reshape(tuple(batch) + (k1 * l, k1, n))


def generate_lut(input_bits: int, output_bits: int, f, params: WopbsParams) -> np.ndarray:
    """Multivariate multivalued LUT, one packed polynomial stack per output bit.

    Mirrors reference `generate_multivariate_luts`
    (shortint_woppbs_1bit.rs:366-403): entry for input value v lives at flat
    index v (monomial v of polynomial v >> log2 N); output bit o is the o-th
    most significant of the `output_bits`-bit result of f.

    Returns [output_bits, P, N] u64 with P = 2^max(0, input_bits - log2 N).
    """
    assert 0 < input_bits <= 16
    assert 0 < output_bits <= 64
    n = params.polynomial_size
    logn = params.log2_poly_size
    tree_bits = max(0, input_bits - logn)
    p_count = 1 << tree_bits

    vals = np.array([int(f(v)) for v in range(1 << input_bits)], dtype=np.uint64)
    lut = np.zeros((output_bits, p_count * n), dtype=np.uint64)
    for o in range(output_bits):
        bits = (vals >> np.uint64(output_bits - 1 - o)) & np.uint64(1)
        lut[o, : 1 << input_bits] = bits << np.uint64(63)
    return lut.reshape(output_bits, p_count, n)


def vertical_packing(ggsw, luts, params: WopbsParams,
                     use_conv: bool | str | None = None):
    """Evaluate the packed LUTs under the GGSW-encrypted selector bits.

    ggsw: [..., T, L, k+1, k+1, N] — T selector bits, MSB first.
    luts: [O, P, N] u64 cleartext LUT polynomials (shared across the batch).
    returns LWE [..., O, kN+1] — one ct per output bit.

    Off-CPU the CMuxes run on the grouped Pallas kernel (each batch lane has
    its own selector GGSW, shared by its O·P accumulator group; the
    negacirculants are built in VMEM) or as grouped int8 convolutions; on
    CPU via negacirculant f64 GEMMs. Mode via blind_rotate.resolve_mode.
    """
    p = params
    mode = br.resolve_mode(use_conv)
    ggsw = jnp.asarray(ggsw, U64)
    luts = jnp.asarray(luts, U64)
    o_bits, p_count, n = luts.shape
    t = ggsw.shape[-5]
    tree_bits = p_count.bit_length() - 1
    low_bits = t - tree_bits
    assert low_bits == min(t, p.log2_poly_size)

    batch = ggsw.shape[:-5]
    k1 = p.glwe_dimension + 1

    # trivial GLWE accumulators: [..., O, P, k+1, N]
    body = jnp.broadcast_to(luts, batch + (o_bits, p_count, n))
    acc = jnp.concatenate(
        [jnp.zeros(batch + (o_bits, p_count, p.glwe_dimension, n), dtype=U64),
         body[..., None, :]], axis=-2)

    rows = ggsw_to_rows(ggsw.reshape((-1,) + ggsw.shape[-4:]))
    rows = rows.reshape(batch + (t,) + rows.shape[-3:])            # [..., T, R, k+1, N]

    js_vp = 0
    pair_mode = False
    if mode == "conv":
        flat_rows = rows.reshape((-1,) + rows.shape[-3:])
        planes = jax.vmap(polynomial.split_polys_for_conv)(flat_rows)
        planes = planes.reshape(batch + (t,) + planes.shape[-4:])  # [..., T, 8, O, R, N]
    elif mode == "pallas":
        import os as _os

        from tfhe_aes2_tpu.ops import truncation
        from tfhe_aes2_tpu.ops.pallas import extprod
        # the GGSW selectors are circuit-bootstrap outputs: their noise floor
        # (~2^36 at production) covers the low limb planes, so the CMux-tree
        # dots skip them (ops/truncation.py; TFHE_VP_TRUNC=0 disables)
        js_vp = truncation.vp_ggsw_j_start(p)
        flat_rows = rows.reshape((-1,) + rows.shape[-3:])
        planes = jax.vmap(extprod.split_polys_for_pallas)(flat_rows)
        planes = planes[:, js_vp:]
        planes = planes.reshape(batch + (t,) + planes.shape[-4:])
        # [..., T, 8-js, R, k+1, 2N]
        # pair mode: the stage loop (sub, gadget decompose, rotate, add) runs
        # on native (lo, hi) u32 pairs instead of XLA-emulated u64. Measured
        # a wash at production (probe20: 25.2 vs 25.5 ms/call slope-timed —
        # XLA's emulation of these add/shift-heavy ops is fine; the int64
        # MULTIPLIES in ntt.py's Garner were the pathological case probe19
        # caught). Kept as default for the smaller op graph and because the
        # fused kernel already produces the pair; u64 exists only at
        # entry/exit. Requires the fused kernel (the partials path
        # recombines in XLA u64).
        pair_mode = (_os.environ.get("TFHE_VP_FUSED", "1") != "0"
                     and _os.environ.get("TFHE_VP_PAIR", "1") != "0"
                     and _os.environ.get("TFHE_VP_NTT", "0") != "1")

    if pair_mode:
        from tfhe_aes2_tpu.ops import decomposition as dec
        from tfhe_aes2_tpu.ops import u32pair as up
        from tfhe_aes2_tpu.ops.pallas import extprod

        b_flat = 1
        for s in batch:
            b_flat *= s
        bound = dec.digit_bound(p.cbs_base_log)

        def cmux_stage_pair(bit_idx, ct0, ct1):
            diff = up.sub(ct1, ct0)
            dl = up.decompose(diff, p.cbs_base_log, p.cbs_level)
            # [..., k+1, N, L] -> rows r = u·L + l (decompose_glwe order)
            dl = jnp.moveaxis(dl, -1, -2)
            digits = dl.reshape(dl.shape[:-3]
                                + (dl.shape[-3] * dl.shape[-2], dl.shape[-1]))
            g_flat = 1
            for s in digits.shape[len(batch): -2]:
                g_flat *= s
            d4 = digits.reshape((b_flat, g_flat) + digits.shape[-2:])
            kp = planes[..., bit_idx, :, :, :, :]
            kp = jnp.moveaxis(kp.reshape((b_flat,) + kp.shape[len(batch):]),
                              1, 0)
            lo, hi = extprod.polymul_digits_pallas_grouped_pair(
                d4, kp, bound, j_start=js_vp)
            out = (lo.reshape(diff[0].shape), hi.reshape(diff[0].shape))
            return up.add(ct0, out)

        acc = up.from_u64(acc)
        for level in range(tree_bits):
            bit_idx = tree_bits - 1 - level
            even = (acc[0][..., 0::2, :, :], acc[1][..., 0::2, :, :])
            odd = (acc[0][..., 1::2, :, :], acc[1][..., 1::2, :, :])
            acc = cmux_stage_pair(bit_idx, even, odd)

        acc = (acc[0][..., 0, :, :], acc[1][..., 0, :, :])    # [..., O, k+1, N]

        for j in range(low_bits):
            bit_idx = tree_bits + j
            step = 1 << (low_bits - 1 - j)
            rotated = up.static_rot(acc, 2 * n - step, n)
            acc = cmux_stage_pair(bit_idx, acc, rotated)

        return br.sample_extract0(up.to_u64(*acc))            # [..., O, kN+1]

    def cmux_stage(bit_idx, ct0, ct1, group_ndim):
        if mode == "matmul":
            g = rows[..., bit_idx, :, :, :]
            return br.cmux_grouped(g, ct0, ct1, p.cbs_base_log, p.cbs_level,
                                   group_ndim=group_ndim)
        diff = ct1 - ct0
        digits = br.decompose_glwe(diff, p.cbs_base_log, p.cbs_level)
        g_shape = digits.shape[len(batch): -2]
        b_flat = 1
        for s in batch:
            b_flat *= s
        g_flat = 1
        for s in g_shape:
            g_flat *= s
        d4 = digits.reshape((b_flat, g_flat) + digits.shape[-2:])
        kp = planes[..., bit_idx, :, :, :, :]
        kp = jnp.moveaxis(kp.reshape((b_flat,) + kp.shape[len(batch):]), 1, 0)
        from tfhe_aes2_tpu.ops import decomposition as dec
        if mode == "pallas":
            import os as _os

            from tfhe_aes2_tpu.ops.pallas import extprod
            if (_os.environ.get("TFHE_VP_NTT", "0") == "1"
                    and kp.shape[0] <= 4):
                # CRT-NTT lowering: shared transform matrices on the MXU
                # instead of per-lane negacirculant ladders (ops/ntt.py)
                from tfhe_aes2_tpu.ops import ntt
                out = ntt.polymul_digits_ntt_grouped(
                    d4, kp, dec.digit_bound(p.cbs_base_log), j_start=js_vp)
            else:
                out = extprod.polymul_digits_pallas_grouped(
                    d4, kp, dec.digit_bound(p.cbs_base_log), j_start=js_vp)
        else:
            out = polynomial.polymul_digits_conv_grouped(
                d4, kp, dec.digit_bound(p.cbs_base_log))
        return ct0 + out.reshape(diff.shape)

    # CMux tree over the packed polynomials, consuming tree bits LSB-first
    # (bit tree_bits-1 distinguishes adjacent polynomials).
    for level in range(tree_bits):
        bit_idx = tree_bits - 1 - level
        even, odd = acc[..., 0::2, :, :], acc[..., 1::2, :, :]
        acc = cmux_stage(bit_idx, even, odd, group_ndim=2)

    acc = acc[..., 0, :, :]                                        # [..., O, k+1, N]

    # rotation stage over the low bits (MSB of the low group first)
    for j in range(low_bits):
        bit_idx = tree_bits + j
        step = 1 << (low_bits - 1 - j)
        rotated = polynomial.monomial_mul_static(acc, 2 * n - step)
        acc = cmux_stage(bit_idx, acc, rotated, group_ndim=1)

    return br.sample_extract0(acc)                                 # [..., O, kN+1]


def circuit_bootstrap_vertical_packing(bits_big, luts, sks: ServerKeySet,
                                       params: WopbsParams):
    """Full WoP-PBS: input bits [..., T, kN+1] (MSB first) + LUTs [O, P, N]
    -> output bits [..., O, kN+1]."""
    ggsw = circuit_bootstrap_bits(bits_big, sks, params)
    return vertical_packing(ggsw, luts, params)
