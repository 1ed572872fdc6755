"""Blind rotation + programmable bootstrap (the hot loop).

TPU-native equivalent of tfhe-rs `blind_rotate_assign_mem_optimized` +
`extract_lwe_sample_from_glwe_ciphertext` (reference call sites
shortint_1bit.rs:319-350 and inside every WoP-PBS circuit bootstrap). Instead
of the reference's per-core f64 FFT loop, the CMux chain is a
`lax.scan` whose external product is an exact int8-limb matmul against the
negacirculant of the shared BSK entry — all concurrent bootstraps in the
batch advance through step i together, so the MXU sees one
[batch, (k+1)·L·N] x [(k+1)·L·N, (k+1)·N] product per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import decomposition, polynomial
from tfhe_aes2_tpu.ops.params import WopbsParams
from tfhe_aes2_tpu.ops.torus import U64


def mod_switch(x, log2n: int):
    """u64 torus -> Z_{2N}: round(x · 2N / 2^64), int32 in [0, 2N)."""
    x = jnp.asarray(x, U64)
    shift = 64 - (log2n + 1)
    return ((x + (jnp.uint64(1) << jnp.uint64(shift - 1))) >> jnp.uint64(shift)).astype(jnp.int32)


def decompose_glwe(glwe, base_log: int, levels: int):
    """GLWE [..., k+1, N] -> digits [..., (k+1)·levels, N] int32, ordered so
    that row index r = u·levels + l matches BSK row (l, u) transposed below."""
    d = decomposition.decompose(glwe, base_log, levels)   # [..., k+1, N, L]
    d = jnp.moveaxis(d, -1, -2)                           # [..., k+1, L, N]
    shape = d.shape
    return d.reshape(shape[:-3] + (shape[-3] * shape[-2], shape[-1]))


def _bsk_rows(bsk_i):
    """BSK entry [L, k+1(row u), k+1(comp), N] -> [(k+1)·L (r = u·L + l), k+1, N]
    matching decompose_glwe's row order."""
    l, k1, _, n = bsk_i.shape
    return jnp.transpose(bsk_i, (1, 0, 2, 3)).reshape(l * k1, k1, n)


def external_product_shared(ggsw_rows, glwe, base_log: int, levels: int):
    """GGSW (shared across batch) ⊡ GLWE (batched).

    ggsw_rows: [(k+1)·levels, k+1, N] u64 (row-major (u, l))
    glwe:      [..., k+1, N] u64
    """
    digits = decompose_glwe(glwe, base_log, levels)
    return polynomial.polymul_digits_shared(
        digits, ggsw_rows, decomposition.digit_bound(base_log))


def external_product_grouped(ggsw_rows, glwe, base_log: int, levels: int,
                             group_ndim: int = 0):
    """GGSW rows [..., R, k+1, N] applied to GLWEs [..., G..., k+1, N] that
    share the GGSW over `group_ndim` trailing group axes."""
    digits = decompose_glwe(glwe, base_log, levels)
    return polynomial.polymul_digits_grouped(
        digits, ggsw_rows, decomposition.digit_bound(base_log), group_ndim)


def cmux_shared(ggsw_rows, ct0, ct1, base_log: int, levels: int):
    """ct0 + GGSW ⊡ (ct1 - ct0) — select ct1 when the encrypted bit is 1."""
    diff = jnp.asarray(ct1, U64) - jnp.asarray(ct0, U64)
    return jnp.asarray(ct0, U64) + external_product_shared(ggsw_rows, diff, base_log, levels)


def cmux_grouped(ggsw_rows, ct0, ct1, base_log: int, levels: int,
                 group_ndim: int = 0):
    diff = jnp.asarray(ct1, U64) - jnp.asarray(ct0, U64)
    return jnp.asarray(ct0, U64) + external_product_grouped(
        ggsw_rows, diff, base_log, levels, group_ndim)


def external_product_conv(kernel_planes, glwe, base_log: int, levels: int):
    """Conv-formulated external product (GGSW shared across the batch).

    kernel_planes: [8, k+1, R, N] int8 from polynomial.split_polys_for_conv.
    glwe:          [..., k+1, N] u64.
    """
    digits = decompose_glwe(glwe, base_log, levels)       # [..., R, N]
    batch = digits.shape[:-2]
    out = polynomial.polymul_digits_conv(
        digits.reshape((-1,) + digits.shape[-2:]), kernel_planes,
        decomposition.digit_bound(base_log))
    return out.reshape(batch + out.shape[-2:])


def cmux_conv(kernel_planes, ct0, ct1, base_log: int, levels: int):
    diff = jnp.asarray(ct1, U64) - jnp.asarray(ct0, U64)
    return jnp.asarray(ct0, U64) + external_product_conv(
        kernel_planes, diff, base_log, levels)


_BR_MODES = ("matmul", "conv", "pallas")


def resolve_mode(mode: str | bool | None) -> str:
    """CMux lowering: 'matmul' (CPU f64 GEMM over negacirculants), 'conv'
    (int8 XLA convolutions) or 'pallas' (VMEM-negacirculant MXU kernel).
    None/True -> TFHE_BR_MODE env or 'pallas' off-CPU, 'matmul' on CPU.

    Unknown mode strings are rejected: the conv/pallas branches apply the
    entry X^{-b~} rotation inside their pair-ladder path, so a typo'd mode
    falling through to the generic loop would silently skip the rotation
    and produce wrong ciphertexts (ADVICE r4)."""
    import os

    if not isinstance(mode, str):
        if jax.default_backend() == "cpu" and mode is not True:
            return "matmul"
        mode = os.environ.get("TFHE_BR_MODE", "pallas")
    if mode not in _BR_MODES:
        raise ValueError(
            f"unknown blind-rotate mode {mode!r}; expected one of {_BR_MODES}")
    return mode


def bsk_j_start(params: WopbsParams) -> int:
    """Lowest BSK limb plane kept by the pallas CMux kernels.

    Dropping planes below the BSK noise floor is sound: the truncation error
    enters the same Σ digit·(·) sums as the BSK noise itself; the two-arm
    criterion (key-noise floor / gadget-rounding budget) lives in
    ops/truncation.py. js=2 at production — the PBS rounding term dominates
    the BSK noise there, so the CMux keeps 11/15 of its int8 dots;
    TFHE_BSK_TRUNC=0 disables."""
    from tfhe_aes2_tpu.ops import truncation

    return truncation.bsk_j_start(params)


def prepare_bsk(bsk, params: WopbsParams):
    """u64 BSK [n, L, k+1, k+1, N] -> pallas-ready int8 plane tensor
    [n, k+1(component), R, 8-j_start, 2N] (the blind-rotate scan layout).

    blind_rotate_glwe recognises the int8 dtype and skips the per-call limb
    split + transpose of the whole key — at production shapes that setup cost
    ~0.17ms of the 0.91ms CMux step (amortized over the 677-step scan)."""
    from tfhe_aes2_tpu.ops.pallas import extprod

    rows = jax.vmap(_bsk_rows)(jnp.asarray(bsk, U64))     # [n, R, k+1, N]
    planes = jax.vmap(extprod.split_polys_for_pallas)(rows)
    planes = planes[:, bsk_j_start(params):]              # [n, 8-js, R, k+1, 2N]
    return jnp.transpose(planes, (0, 3, 2, 1, 4))


def blind_rotate_glwe(lwe, bsk, acc_glwe, params: WopbsParams,
                      use_conv: bool | str | None = None):
    """Blind-rotate an arbitrary GLWE accumulator by the phase of `lwe`.

    lwe:      [..., n+1] u64 (under the small key)
    bsk:      [n, L, k+1, k+1, N] u64
    acc_glwe: [..., k+1, N] u64 (possibly encrypted; broadcastable over batch)

    Off-CPU the CMux chain runs on native (lo, hi) u32 pairs — rotation
    ladders, gadget digit fields, carry adds are all 32-bit vector ops — and
    the external products run as int8 MXU contractions (`resolve_mode`).
    """
    p = params
    n, logn = p.polynomial_size, p.log2_poly_size
    # a prepared BSK (int8 plane tensor, see prepare_bsk) skips the per-call
    # limb split + transpose of the full ~400MB key — measured ~0.17ms of the
    # 0.91ms production CMux step was this per-call setup amortized over the
    # scan
    prepared = getattr(bsk, "dtype", None) == jnp.int8
    if prepared and isinstance(use_conv, str) and use_conv != "pallas":
        raise ValueError(
            f"blind_rotate mode {use_conv!r} needs the raw u64 BSK, but a "
            "prepared int8 plane tensor was passed (keys.prepare_server_keys)")
    mode = "pallas" if prepared else resolve_mode(use_conv)
    lwe = jnp.asarray(lwe, U64)
    batch_shape = lwe.shape[:-1]

    a_tilde = mod_switch(lwe[..., :-1], logn)             # [..., n_lwe]
    b_tilde = mod_switch(lwe[..., -1], logn)              # [...]

    acc = jnp.broadcast_to(jnp.asarray(acc_glwe, U64),
                           batch_shape + (p.glwe_dimension + 1, n))
    t0 = (2 * n - b_tilde) % (2 * n)                      # X^{-b~} amount
    if mode == "matmul":
        # the conv/pallas branches apply t0 as a u32-pair binary ladder
        # after the pair conversion instead: the u64 gather form
        # (take_along_axis) measured 25.8 ms/call at production 8-block
        # shapes vs 0.05 for the ladder (probe23) — TPU gathers are
        # scalar-bound and this one ran once per PBS on the whole batch
        acc = polynomial.monomial_mul(acc, t0[..., None])

    if not prepared:
        bsk_rows = jax.vmap(_bsk_rows)(jnp.asarray(bsk, U64))
        # [n_lwe, R, k+1, N]
    a_steps = jnp.moveaxis(a_tilde, -1, 0)                # [n_lwe, ...]

    if mode in ("conv", "pallas"):
        from tfhe_aes2_tpu.ops import torus, u32pair as up
        from tfhe_aes2_tpu.ops.pallas import extprod

        bound = decomposition.digit_bound(p.pbs_base_log)
        n_d = torus.limbs_for_bound(bound)
        k1 = p.glwe_dimension + 1
        batch_flat = 1
        for s in batch_shape:
            batch_flat *= s

        import os as _os
        mstack2 = extprod.use_mstack2() if mode == "pallas" else False
        ncs = extprod.use_nc_scratch() if mode == "pallas" else False
        # A (o, r, bb)-grid ladder-reuse variant (TFHE_BR_BBIN) was removed:
        # it measured 3x slower at 16 blocks (PERF.md batch-wall table) AND
        # its bb-innermost grid revisited output blocks non-consecutively,
        # which Pallas TPU's output-window semantics don't guarantee safe
        # with input_output_aliases (ADVICE r3).
        if mode == "pallas":
            if prepared:
                ext_or_all = jnp.asarray(bsk)  # [n, k1, R, 8-j_start, 2N]
                j_start = 8 - ext_or_all.shape[3]
                bsk_planes = None
            else:
                bsk_planes = jax.vmap(extprod.split_polys_for_pallas)(bsk_rows)
                j_start = bsk_j_start(p)
                bsk_planes = bsk_planes[:, j_start:]
        else:
            bsk_planes = jax.vmap(polynomial.split_polys_for_conv)(bsk_rows)

        if mode == "pallas" and _os.environ.get("TFHE_BR_GLUE", "pallas") != "xla":
            # Fully fused CMux step: two pallas calls (rot/diff/decompose
            # glue + matmul/recombine); the [O, 2, B, N] u32 accumulator is
            # the scan carry, so no XLA glue or layout change runs between
            # steps.
            if not prepared:
                ext_or_all = jnp.transpose(bsk_planes, (0, 3, 2, 1, 4))
                # [n_lwe, O(k1), R, 8-j_start, 2N]
            acc_pair0 = up.monomial_mul(
                up.from_u64(acc.reshape((batch_flat, k1, n))),
                t0.reshape((batch_flat,))[:, None], n)
            acc_of = jnp.stack([jnp.moveaxis(acc_pair0[0], -2, 0),
                                jnp.moveaxis(acc_pair0[1], -2, 0)], axis=1)

            # TFHE_BR_KERNEL selects the step lowering (v5e measurements,
            # B=512 production shapes):
            #   gridg (default; full-bench 0.699 vs grid 0.678 blocks/s at
            #     BSK js=2): grid with the NEXT step's glue fused into the
            #     dot kernel's finish — one pallas call per step. Lost to
            #     grid while the step had 13 dots (0.550 vs 0.576 at js=1);
            #     the budget-arm truncation cut the dots to 11, the glue
            #     became relatively larger, and the fused form flipped ahead.
            #   grid: two calls per step (rot_diff_digits glue +
            #     extprod_step2 dots/recombine)
            #   longk (4.3ms/step): per (o, BSK-plane) ONE [B, R·N] x
            #     [R·N, N] dot per digit limb — fewer bucket-scratch
            #     read-modify-writes than grid on paper, but measured 3.3x
            #     slower (probes/bench_probe7.py dissects why)
            #   merged (4.2ms/step): whole step in ONE pallas call — the
            #     dynamic scratch/accumulator indexing it needs defeats
            #     Mosaic (dynamic-slice copies per dot)
            #   bucket (3.5ms/step): extprod_step3 same-target dot chains —
            #     Mosaic does not fuse them into MXU accumulation, so it
            #     just doubles the negacirculant builds
            kern_kind = _os.environ.get("TFHE_BR_KERNEL", "gridg")

            if kern_kind == "gridg":
                k1l = (k1, p.pbs_level, n_d, batch_flat, n)
                dig0 = extprod.rot_diff_digits(
                    acc_of, a_steps[0].reshape((batch_flat,)),
                    p.pbs_base_log, p.pbs_level, n_d).reshape(k1l)
                # step i consumes ext_i and emits digits for a_{i+1}; the
                # final glue output is discarded (pad with t=0)
                a_next = jnp.concatenate(
                    [a_steps[1:], jnp.zeros_like(a_steps[:1])], axis=0)

                def step_g(carry, xs):
                    acc_of, dig = carry
                    ext_or, t_nxt = xs
                    acc_of, dig = extprod.extprod_step2g(
                        dig, ext_or, acc_of,
                        t_nxt.reshape((batch_flat,)),
                        base_log=p.pbs_base_log, levels=p.pbs_level,
                        j_start=j_start, mstack2=mstack2, nc_scratch=ncs)
                    return (acc_of, dig), None

                # TFHE_BR_UNROLL: scan-body unrolling amortizes the XLA
                # while-loop bookkeeping across CMux steps (677 iterations)
                unroll = int(_os.environ.get("TFHE_BR_UNROLL", "1"))
                (acc_of, _), _ = jax.lax.scan(
                    step_g, (acc_of, dig0), (ext_or_all, a_next),
                    unroll=max(1, unroll))
                out = up.to_u64(jnp.moveaxis(acc_of[:, 0], 0, -2),
                                jnp.moveaxis(acc_of[:, 1], 0, -2))
                return out.reshape(batch_shape + (k1, n))

            if kern_kind == "longk":
                if bsk_planes is None:       # prepared BSK
                    bsk_planes = jnp.transpose(ext_or_all, (0, 3, 2, 1, 4))
                # [n_lwe, O, 8-j_start(j), R, 2N]
                ext_oj_all = jnp.transpose(bsk_planes, (0, 3, 1, 2, 4))

                def step_longk(acc_of, xs):
                    ext_oj, a_i = xs
                    dig = extprod.rot_diff_digits_flat(
                        acc_of, a_i.reshape((batch_flat,)),
                        p.pbs_base_log, p.pbs_level, n_d)
                    return extprod.extprod_step_longk(
                        dig, ext_oj, acc_of, j_start=j_start), None

                acc_of, _ = jax.lax.scan(step_longk, acc_of,
                                         (ext_oj_all, a_steps))
                out = up.to_u64(jnp.moveaxis(acc_of[:, 0], 0, -2),
                                jnp.moveaxis(acc_of[:, 1], 0, -2))
                return out.reshape(batch_shape + (k1, n))

            def step_fused(acc_of, xs):
                ext_or, a_i = xs
                if kern_kind == "merged":
                    return extprod.cmux_step_merged(
                        a_i.reshape((batch_flat,)), ext_or, acc_of,
                        p.pbs_base_log, p.pbs_level, j_start=j_start), None
                step_kernel = (extprod.extprod_step3 if kern_kind == "bucket"
                               else extprod.extprod_step2)
                dig = extprod.rot_diff_digits(
                    acc_of, a_i.reshape((batch_flat,)),
                    p.pbs_base_log, p.pbs_level, n_d)
                if step_kernel is extprod.extprod_step2:
                    return step_kernel(dig, ext_or, acc_of, j_start=j_start,
                                       mstack2=mstack2, nc_scratch=ncs), None
                return step_kernel(
                    dig, ext_or, acc_of, j_start=j_start), None

            acc_of, _ = jax.lax.scan(step_fused, acc_of, (ext_or_all, a_steps))
            out = up.to_u64(jnp.moveaxis(acc_of[:, 0], 0, -2),
                            jnp.moveaxis(acc_of[:, 1], 0, -2))
            return out.reshape(batch_shape + (k1, n))

        if bsk_planes is None:                 # prepared BSK + xla glue
            bsk_planes = jnp.transpose(ext_or_all, (0, 3, 2, 1, 4))

        acc_pair = up.monomial_mul(
            up.from_u64(acc.reshape((batch_flat, k1, n))),
            t0.reshape((batch_flat,))[:, None], n)

        def step(acc_pair, xs):
            planes_i, a_i = xs
            t = a_i.reshape((batch_flat,))[:, None]
            rot = up.monomial_mul(acc_pair, t, n)
            diff = up.sub(rot, acc_pair)
            digits = up.decompose(diff, p.pbs_base_log, p.pbs_level)
            # [B, k1, N, L] -> rows r = u·L + l: [B, k1·L, N]
            digits = jnp.moveaxis(digits, -1, -2).reshape(
                (batch_flat, k1 * p.pbs_level, n))
            if mode == "pallas":
                digit_planes = torus.split_int32_signed(digits, n_d)
                new_pair = extprod.extprod_step(
                    digit_planes, planes_i, acc_pair[0], acc_pair[1],
                    j_start=j_start, mstack2=mstack2)
                return new_pair, None
            partials = polynomial.conv_partials(digits, planes_i, bound)
            out_pair = up.accumulate_partials(partials)
            return up.add(acc_pair, out_pair), None

        acc_pair, _ = jax.lax.scan(step, acc_pair, (bsk_planes, a_steps))
        return up.to_u64(*acc_pair).reshape(batch_shape + (k1, n))

    def step(acc, xs):
        rows_i, a_i = xs
        rotated = polynomial.monomial_mul(acc, a_i[..., None])  # X^{a_i}·acc
        acc = cmux_shared(rows_i, acc, rotated, p.pbs_base_log, p.pbs_level)
        return acc, None

    acc, _ = jax.lax.scan(step, acc, (bsk_rows, a_steps))
    return acc


def blind_rotate(lwe, bsk, test_poly, params: WopbsParams):
    """Rotate the clear `test_poly` (trivial accumulator) by the phase of
    `lwe` under encryption.

    lwe:       [..., n+1] u64 (under the small key)
    bsk:       [n, L, k+1, k+1, N] u64
    test_poly: [..., N] u64 (body of the trivial accumulator; broadcastable)
    returns:   GLWE [..., k+1, N]
    """
    p = params
    n = p.polynomial_size
    test_poly = jnp.asarray(test_poly, U64)
    acc = jnp.concatenate(
        [jnp.zeros(test_poly.shape[:-1] + (p.glwe_dimension, n), dtype=U64),
         test_poly[..., None, :]], axis=-2)
    return blind_rotate_glwe(lwe, bsk, acc, params)


def sample_extract0(glwe):
    """Extract coefficient 0 as an LWE ct under the flattened GLWE key.

    glwe [..., k+1, N] -> lwe [..., k·N + 1]:
      a[u·N]     =  A_u[0]
      a[u·N + i] = -A_u[N - i]   (i >= 1)
      b          =  B[0]
    """
    glwe = jnp.asarray(glwe, U64)
    a, b = glwe[..., :-1, :], glwe[..., -1, :]
    head = a[..., :, :1]
    tail = jnp.uint64(0) - jnp.flip(a[..., :, 1:], axis=-1)
    mask = jnp.concatenate([head, tail], axis=-1)         # [..., k, N]
    mask = mask.reshape(mask.shape[:-2] + (-1,))
    return jnp.concatenate([mask, b[..., :1]], axis=-1)


def pbs_bit_to_level(lwe_small, bsk, target_log: int, params: WopbsParams):
    """Bootstrap a 1-bit LWE (bit at 2^63) to LWE_bigkey(bit · 2^(64-target_log)).

    The gadget-scaling PBS inside circuit bootstrapping (tfhe-rs
    `homomorphic_shift_boolean`): shift the input by q/4 so the noise around 0
    stays on one side, blind-rotate a constant test vector
    c = -2^(64-target_log-1), extract, and re-center by adding -c.
    """
    p = params
    c = (1 << 64) - (1 << (64 - target_log - 1))          # -2^(64-target-1) mod 2^64
    shifted = jnp.asarray(lwe_small, U64).at[..., -1].add(jnp.uint64(1 << 62))
    test_poly = jnp.full((p.polynomial_size,), jnp.uint64(c))
    acc = blind_rotate(shifted, bsk, test_poly, p)
    out = sample_extract0(acc)
    return out.at[..., -1].add(jnp.uint64((1 << (64 - target_log - 1))))
