"""Negacyclic polynomial arithmetic tests (ops/polynomial.py)."""

import numpy as np
import jax.numpy as jnp

from tfhe_aes2_tpu.ops import polynomial


def _nega_ref(a_int, b_u64, n):
    """Schoolbook negacyclic product via python ints, mod 2^64."""
    out = [0] * n
    for i in range(n):
        for j in range(n):
            m = i + j
            v = int(a_int[i]) * int(b_u64[j])
            if m >= n:
                out[m - n] -= v
            else:
                out[m] += v
    return np.array([o % (1 << 64) for o in out], dtype=np.uint64)


def test_monomial_mul():
    rng = np.random.default_rng(5)
    n = 16
    p = rng.integers(0, 1 << 64, n, dtype=np.uint64)
    for t in [0, 1, 5, n - 1, n, n + 3, 2 * n - 1]:
        got = np.asarray(polynomial.monomial_mul(jnp.asarray(p), jnp.int32(t)))
        # reference: multiply by the monomial = negacyclic conv with e_t
        e = np.zeros(n, dtype=np.int64)
        if t < n:
            e[t] = 1
            expect = _nega_ref(e, p, n)
        else:
            e[t - n] = 1
            expect = np.uint64(0) - _nega_ref(e, p, n)
        np.testing.assert_array_equal(got, expect, err_msg=f"t={t}")


def test_monomial_mul_batched_t():
    rng = np.random.default_rng(6)
    n = 8
    p = rng.integers(0, 1 << 64, (3, n), dtype=np.uint64)
    t = np.array([1, n, 2 * n - 1], dtype=np.int32)
    got = np.asarray(polynomial.monomial_mul(jnp.asarray(p), jnp.asarray(t)))
    for b in range(3):
        single = np.asarray(polynomial.monomial_mul(jnp.asarray(p[b]), jnp.int32(t[b])))
        np.testing.assert_array_equal(got[b], single)


def test_polymul_digits_shared():
    rng = np.random.default_rng(7)
    n, r, o, batch = 16, 3, 2, 4
    bound = 1 << 11
    digits = rng.integers(-bound, bound + 1, (batch, r, n), dtype=np.int32)
    polys = rng.integers(0, 1 << 64, (r, o, n), dtype=np.uint64)
    got = np.asarray(polynomial.polymul_digits_shared(
        jnp.asarray(digits), jnp.asarray(polys), bound))
    for b in range(batch):
        for oo in range(o):
            with np.errstate(over="ignore"):
                expect = np.zeros(n, dtype=np.uint64)
                for rr in range(r):
                    expect += _nega_ref(digits[b, rr], polys[rr, oo], n)
            np.testing.assert_array_equal(got[b, oo], expect)


def test_polymul_digits_conv_matches_shared():
    """The conv-formulated TPU hot path vs the negacirculant matmul path."""
    rng = np.random.default_rng(11)
    n, r, o, batch = 32, 6, 3, 5
    bound = 1 << 11
    digits = rng.integers(-bound, bound + 1, (batch, r, n), dtype=np.int32)
    polys = rng.integers(0, 1 << 64, (r, o, n), dtype=np.uint64)
    expect = np.asarray(polynomial.polymul_digits_shared(
        jnp.asarray(digits), jnp.asarray(polys), bound))
    planes = polynomial.split_polys_for_conv(jnp.asarray(polys))
    got = np.asarray(polynomial.polymul_digits_conv(
        jnp.asarray(digits), planes, bound))
    np.testing.assert_array_equal(got, expect)


def test_blind_rotate_conv_path(keys_test, monkeypatch):
    """Pallas-lowered PBS vs the matmul lowering: bit-exact with BSK limb
    truncation disabled; within the truncation error bound with it on (the
    default — blind_rotate.py drops the lowest BSK limb plane when its
    products sit below the BSK noise floor)."""
    import jax
    from tfhe_aes2_tpu.ops import blind_rotate as br
    client, sks = keys_test
    p = client.params
    import jax.numpy as jnp2
    sks_dev = jax.tree_util.tree_map(jnp2.asarray, sks)
    from tfhe_aes2_tpu.ops import keyswitch as ksw
    bits = np.array([0, 1, 1, 0])
    cts = client.encrypt_bits(bits)
    dual = ksw.keyswitch(jnp.asarray(cts), sks_dev.ksk, p)
    tv = jnp.full((p.polynomial_size,),
                  jnp.uint64((1 << 64) - (1 << (64 - p.cbs_base_log - 1))))
    shifted = jnp.asarray(dual).at[..., -1].add(jnp.uint64(1 << 62))
    acc_mm = br.blind_rotate(shifted, sks_dev.bsk, tv, p)
    # force the pallas path explicitly (CPU default is matmul)
    acc_body = jnp.concatenate(
        [jnp.zeros((p.glwe_dimension, p.polynomial_size), dtype=jnp.uint64),
         tv[None]], axis=0)
    monkeypatch.setenv("TFHE_BSK_TRUNC", "0")
    acc_cv = br.blind_rotate_glwe(shifted, sks_dev.bsk, acc_body, p,
                                  use_conv=True)
    out_mm = np.asarray(br.sample_extract0(acc_mm))
    out_cv = np.asarray(br.sample_extract0(acc_cv))
    np.testing.assert_array_equal(out_mm, out_cv)

    # truncation on: the two trajectories diverge by the inherent
    # decomposition-rounding noise (digit re-rounding differences amplified
    # by the secret key, ~2^44 here), so don't compare runs to each other —
    # assert the truncated run still lands on the ideal phase. The test
    # vector is the constant c at every coefficient, so any rotation yields
    # phase c (+ PBS noise, well under the 2^(64-cbs-1)=2^53 decode margin).
    monkeypatch.setenv("TFHE_BSK_TRUNC", "1")
    acc_tr = br.blind_rotate_glwe(shifted, sks_dev.bsk, acc_body, p,
                                  use_conv=True)
    c = (1 << 64) - (1 << (64 - p.cbs_base_log - 1))
    expect = np.where(bits == 0, np.uint64(c),
                      np.uint64((1 << 64) - c))  # X^t flips the sign for bit 1
    for out in (out_mm, np.asarray(br.sample_extract0(acc_tr))):
        err = (client.decrypt_phase(out) - expect).astype(np.int64)
        assert np.abs(err).max() < 1 << 50, np.abs(err).max()


def test_blind_rotate_fused_glue_matches_xla_glue(keys_test, monkeypatch):
    """The fully fused CMux step (rot_diff_digits + extprod_step2) computes
    the same arithmetic as the XLA-glue pallas path — trajectories must be
    bit-identical for any TFHE_BSK_TRUNC setting."""
    import jax
    from tfhe_aes2_tpu.ops import blind_rotate as br
    client, sks = keys_test
    p = client.params
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    from tfhe_aes2_tpu.ops import keyswitch as ksw
    bits = np.array([1, 0, 1, 1])
    dual = ksw.keyswitch(jnp.asarray(client.encrypt_bits(bits)),
                         sks_dev.ksk, p)
    shifted = jnp.asarray(dual).at[..., -1].add(jnp.uint64(1 << 62))
    acc_body = jnp.concatenate(
        [jnp.zeros((p.glwe_dimension, p.polynomial_size), dtype=jnp.uint64),
         jnp.full((1, p.polynomial_size), jnp.uint64(1) << jnp.uint64(60))],
        axis=0)
    for trunc in ("0", "1"):
        monkeypatch.setenv("TFHE_BSK_TRUNC", trunc)
        monkeypatch.setenv("TFHE_BR_GLUE", "xla")
        ref = np.asarray(br.blind_rotate_glwe(
            shifted, sks_dev.bsk, acc_body, p, use_conv="pallas"))
        monkeypatch.setenv("TFHE_BR_GLUE", "pallas")
        for kern in ("merged", "grid", "gridg", "bucket"):
            monkeypatch.setenv("TFHE_BR_KERNEL", kern)
            got = np.asarray(br.blind_rotate_glwe(
                shifted, sks_dev.bsk, acc_body, p, use_conv="pallas"))
            np.testing.assert_array_equal(got, ref,
                                          err_msg=f"kern={kern} trunc={trunc}")
        # fused-RMW M-stacked dot variant (TFHE_BR_MSTACK2; threaded as a
        # static jit arg, so toggling the env retraces)
        monkeypatch.setenv("TFHE_BR_MSTACK2", "1")
        for kern in ("grid", "gridg"):
            monkeypatch.setenv("TFHE_BR_KERNEL", kern)
            got = np.asarray(br.blind_rotate_glwe(
                shifted, sks_dev.bsk, acc_body, p, use_conv="pallas"))
            np.testing.assert_array_equal(
                got, ref, err_msg=f"kern={kern} trunc={trunc} mstack2")
        # the XLA-glue entry point (extprod_step) threads mstack2 too
        monkeypatch.setenv("TFHE_BR_GLUE", "xla")
        got = np.asarray(br.blind_rotate_glwe(
            shifted, sks_dev.bsk, acc_body, p, use_conv="pallas"))
        np.testing.assert_array_equal(
            got, ref, err_msg=f"xla-glue trunc={trunc} mstack2")
        monkeypatch.delenv("TFHE_BR_MSTACK2")
        # (the TFHE_BR_BBIN ladder-reuse variant was removed: 3x slower on
        # TPU and its bb-innermost grid violated Pallas TPU output-window
        # semantics with the aliased accumulator — PERF.md, ADVICE r3)


def test_pallas_extprod_matches_shared():
    """The Pallas VMEM-negacirculant kernel (interpret mode) vs the
    reference matmul lowering."""
    import jax
    from tfhe_aes2_tpu.ops.pallas import extprod
    from tfhe_aes2_tpu.ops import torus, u32pair as up

    rng = np.random.default_rng(12)
    n, r, o, batch = 64, 4, 2, 8
    bound = 1 << 11
    digits = rng.integers(-bound, bound + 1, (batch, r, n), dtype=np.int32)
    polys = rng.integers(0, 1 << 64, (r, o, n), dtype=np.uint64)

    expect = np.asarray(polynomial.polymul_digits_shared(
        jnp.asarray(digits), jnp.asarray(polys), bound))

    digit_planes = torus.split_int32_signed(jnp.asarray(digits), 2)
    ext_planes = extprod.split_polys_for_pallas(jnp.asarray(polys))
    partials = extprod.extprod_partials(
        digit_planes, ext_planes, interpret=True)
    pdict = {s: partials[s] for s in range(8)}
    got = np.asarray(up.to_u64(*up.accumulate_partials(pdict)))
    np.testing.assert_array_equal(got, expect)


def test_polymul_digits_batched():
    rng = np.random.default_rng(8)
    n, r, o, batch = 8, 2, 2, 3
    bound = 1 << 9
    digits = rng.integers(-bound, bound + 1, (batch, r, n), dtype=np.int32)
    polys = rng.integers(0, 1 << 64, (batch, r, o, n), dtype=np.uint64)
    got = np.asarray(polynomial.polymul_digits_batched(
        jnp.asarray(digits), jnp.asarray(polys), bound))
    for b in range(batch):
        single = np.asarray(polynomial.polymul_digits_shared(
            jnp.asarray(digits[b]), jnp.asarray(polys[b]), bound))
        np.testing.assert_array_equal(got[b], single)


def test_pallas_extprod_grouped_matches_matmul(monkeypatch):
    """The per-lane-kernel Pallas kernel (vertical-packing shape, interpret
    mode) vs the reference grouped matmul lowering."""
    import jax
    from tfhe_aes2_tpu.ops.pallas import extprod
    from tfhe_aes2_tpu.ops import torus

    rng = np.random.default_rng(21)
    n, r, o, b, g = 64, 3, 2, 4, 5
    bound = 1 << 11
    digits = rng.integers(-bound, bound + 1, (b, g, r, n), dtype=np.int32)
    polys = rng.integers(0, 1 << 64, (b, r, o, n), dtype=np.uint64)

    expect = np.asarray(polynomial.polymul_digits_grouped(
        jnp.asarray(digits), jnp.asarray(polys), bound, group_ndim=1))

    ext_planes = jax.vmap(extprod.split_polys_for_pallas)(jnp.asarray(polys))
    ext_planes = jnp.moveaxis(ext_planes, 1, 0)          # [8, B, R, O, 2N]
    monkeypatch.setenv("TFHE_VP_FUSED", "1")
    got = np.asarray(extprod.polymul_digits_pallas_grouped(
        jnp.asarray(digits), ext_planes, bound))
    np.testing.assert_array_equal(got, expect)

    # the per-component-cell variant (TFHE_VP_CELLS=o, grid (B, O)) of the
    # fused kernel — a static jit arg, so the env toggle retraces
    monkeypatch.setenv("TFHE_VP_CELLS", "o")
    got_po = np.asarray(extprod.polymul_digits_pallas_grouped(
        jnp.asarray(digits), ext_planes, bound))
    np.testing.assert_array_equal(got_po, expect)
    monkeypatch.delenv("TFHE_VP_CELLS")

    # the legacy per-(lane, o, r) kernel + XLA recombine (TFHE_VP_FUSED=0)
    # must stay bit-identical to the fused default
    monkeypatch.setenv("TFHE_VP_FUSED", "0")
    got_old = np.asarray(extprod.polymul_digits_pallas_grouped(
        jnp.asarray(digits), ext_planes, bound))
    np.testing.assert_array_equal(got_old, expect)


def test_pallas_extprod_step_fused_matches_unfused():
    """The fused CMux-step kernel (u64 recombination + accumulate in VMEM)
    vs extprod_partials + accumulate_partials + add."""
    from tfhe_aes2_tpu.ops.pallas import extprod
    from tfhe_aes2_tpu.ops import torus, u32pair as up

    rng = np.random.default_rng(33)
    n, r, o, batch = 64, 4, 3, 8
    bound = 1 << 11
    digits = rng.integers(-bound, bound + 1, (batch, r, n), dtype=np.int32)
    polys = rng.integers(0, 1 << 64, (r, o, n), dtype=np.uint64)
    acc = rng.integers(0, 1 << 64, (batch, o, n), dtype=np.uint64)

    digit_planes = torus.split_int32_signed(jnp.asarray(digits), 2)
    ext_planes = extprod.split_polys_for_pallas(jnp.asarray(polys))
    acc_pair = up.from_u64(jnp.asarray(acc))

    parts = extprod.extprod_partials(digit_planes, ext_planes, interpret=True)
    expect_pair = up.add(acc_pair,
                         up.accumulate_partials({s: parts[s] for s in range(8)}))
    expect = np.asarray(up.to_u64(*expect_pair))

    got_pair = extprod.extprod_step(digit_planes, ext_planes,
                                    acc_pair[0], acc_pair[1], interpret=True)
    got = np.asarray(up.to_u64(*got_pair))
    np.testing.assert_array_equal(got, expect)

    # batch-tiled grid (large batches must split to respect the scoped-VMEM
    # limit): max_tile=2 forces 4 batch tiles at batch=8
    got_tiled = extprod.extprod_step(digit_planes, ext_planes,
                                     acc_pair[0], acc_pair[1], interpret=True,
                                     max_tile=2)
    np.testing.assert_array_equal(np.asarray(up.to_u64(*got_tiled)), expect)

    # pre-transposed layouts: step2 (grid (bt,o,r)) and step3 (bucket-major
    # dot chains) against the same expectation, incl. j_start truncation
    import jax.numpy as jnp2
    dig_rf = jnp2.moveaxis(digit_planes, 2, 0)          # [R, n_d, B, N]
    acc_of = jnp2.stack([jnp2.moveaxis(acc_pair[0], -2, 0),
                         jnp2.moveaxis(acc_pair[1], -2, 0)], axis=1)
    for js in (0, 1):
        ext_or = jnp2.transpose(ext_planes[js:], (2, 1, 0, 3))
        exp_pair = extprod.extprod_step(digit_planes, ext_planes[js:],
                                        acc_pair[0], acc_pair[1],
                                        interpret=True, j_start=js)
        exp_of = np.asarray(up.to_u64(*exp_pair)).transpose(1, 0, 2)
        for step_fn in (extprod.extprod_step2, extprod.extprod_step3):
            got_of = np.asarray(step_fn(dig_rf, ext_or, acc_of,
                                        interpret=True, j_start=js))
            got_u64 = np.asarray(up.to_u64(got_of[:, 0], got_of[:, 1]))
            np.testing.assert_array_equal(got_u64, exp_of,
                                          err_msg=f"{step_fn.__name__} js={js}")

        # long-K variant: flat digit layout + (O, J, R, 2N) BSK planes
        dig_flat = jnp2.reshape(digit_planes, (2, batch, r * n))
        ext_oj = jnp2.transpose(ext_planes[js:], (2, 0, 1, 3))
        got_of = np.asarray(extprod.extprod_step_longk(
            dig_flat, ext_oj, acc_of, interpret=True, j_start=js))
        got_u64 = np.asarray(up.to_u64(got_of[:, 0], got_of[:, 1]))
        np.testing.assert_array_equal(got_u64, exp_of,
                                      err_msg=f"extprod_step_longk js={js}")


def test_rot_diff_digits_flat_matches_unflat():
    """The flat-layout glue kernel emits exactly the row-major reshape of
    rot_diff_digits' [R, n_d, B, N] output."""
    from tfhe_aes2_tpu.ops.pallas import extprod

    rng = np.random.default_rng(34)
    n, k1, levels, batch, base_log, n_d = 64, 3, 2, 8, 12, 2
    acc = jnp.asarray(
        rng.integers(0, 1 << 32, (k1, 2, batch, n), dtype=np.uint32))
    t = jnp.asarray(rng.integers(0, 2 * n, (batch,), dtype=np.int32))

    unflat = np.asarray(extprod.rot_diff_digits(
        acc, t, base_log, levels, n_d, interpret=True))     # [R, n_d, B, N]
    expect = unflat.transpose(1, 2, 0, 3).reshape(n_d, batch,
                                                  k1 * levels * n)
    got = np.asarray(extprod.rot_diff_digits_flat(
        acc, t, base_log, levels, n_d, interpret=True))
    np.testing.assert_array_equal(got, expect)


def test_extprod_step2g_matches_step2_plus_glue():
    """The glue-fused CMux step (extprod_step2g) emits exactly the same new
    accumulator AND next-step digits as extprod_step2 followed by
    rot_diff_digits."""
    from tfhe_aes2_tpu.ops.pallas import extprod
    from tfhe_aes2_tpu.ops import torus, u32pair as up

    rng = np.random.default_rng(35)
    n, k1, levels, batch, base_log = 64, 3, 2, 8, 12
    r = k1 * levels
    n_d = 2
    polys = rng.integers(0, 1 << 64, (r, k1, n), dtype=np.uint64)
    acc = rng.integers(0, 1 << 64, (batch, k1, n), dtype=np.uint64)
    t0 = jnp.asarray(rng.integers(0, 2 * n, (batch,), dtype=np.int32))
    t1 = jnp.asarray(rng.integers(0, 2 * n, (batch,), dtype=np.int32))

    ext_planes = extprod.split_polys_for_pallas(jnp.asarray(polys))
    acc_pair = up.from_u64(jnp.asarray(acc))
    acc_of = jnp.stack([jnp.moveaxis(acc_pair[0], -2, 0),
                        jnp.moveaxis(acc_pair[1], -2, 0)], axis=1)

    for js in (0, 1):
        ext_or = jnp.transpose(ext_planes[js:], (2, 1, 0, 3))

        dig0 = extprod.rot_diff_digits(acc_of, t0, base_log, levels, n_d,
                                       interpret=True)
        acc1 = extprod.extprod_step2(dig0, ext_or, acc_of, interpret=True,
                                     j_start=js)
        dig1 = extprod.rot_diff_digits(acc1, t1, base_log, levels, n_d,
                                       interpret=True)

        dig0_5d = dig0.reshape(k1, levels, n_d, batch, n)
        acc1_g, dig1_g = extprod.extprod_step2g(
            dig0_5d, ext_or, acc_of, t1, base_log=base_log, levels=levels,
            interpret=True, j_start=js)
        np.testing.assert_array_equal(np.asarray(acc1_g), np.asarray(acc1),
                                      err_msg=f"acc js={js}")
        np.testing.assert_array_equal(
            np.asarray(dig1_g).reshape(r, n_d, batch, n), np.asarray(dig1),
            err_msg=f"dig js={js}")


def test_cmux_step_production_geometry(monkeypatch):
    """Blind-rotate CMux kernels at the PRODUCTION polynomial geometry
    (PARAMS_SQRD_LVL_64: N=512, k=4, R=15, pbs base 12 / level 3, BSK js=2),
    previously exercised only by the TPU bench: a 3-step scan over a
    synthetic BSK, pallas interpret kernels vs the matmul lowering, plus
    kernel-vs-kernel bit-exactness under the production truncation."""
    import dataclasses
    from tfhe_aes2_tpu.ops import blind_rotate as br
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    p = dataclasses.replace(PARAMS_SQRD_LVL_64, lwe_dimension=3)
    rng = np.random.default_rng(42)
    n_lwe, l, k1, n = 3, p.pbs_level, p.glwe_dimension + 1, p.polynomial_size
    bsk = jnp.asarray(rng.integers(0, 1 << 64, (n_lwe, l, k1, k1, n),
                                   dtype=np.uint64))
    lwe = jnp.asarray(rng.integers(0, 1 << 64, (4, n_lwe + 1),
                                   dtype=np.uint64))
    acc = jnp.asarray(rng.integers(0, 1 << 64, (k1, n), dtype=np.uint64))

    monkeypatch.setenv("TFHE_BSK_TRUNC", "0")
    ref = np.asarray(br.blind_rotate_glwe(lwe, bsk, acc, p, use_conv=False))
    got = np.asarray(br.blind_rotate_glwe(lwe, bsk, acc, p,
                                          use_conv="pallas"))
    np.testing.assert_array_equal(got, ref)

    # production BSK truncation (js=2): all kernels/glue modes bit-identical
    monkeypatch.setenv("TFHE_BSK_TRUNC", "1")
    assert br.bsk_j_start(p) == 2
    monkeypatch.setenv("TFHE_BR_GLUE", "xla")
    ref_t = np.asarray(br.blind_rotate_glwe(lwe, bsk, acc, p,
                                            use_conv="pallas"))
    monkeypatch.setenv("TFHE_BR_GLUE", "pallas")
    for kern in ("grid", "gridg"):
        monkeypatch.setenv("TFHE_BR_KERNEL", kern)
        got = np.asarray(br.blind_rotate_glwe(lwe, bsk, acc, p,
                                              use_conv="pallas"))
        np.testing.assert_array_equal(got, ref_t, err_msg=kern)


def test_pfks_production_geometry():
    """pfKS at the production GLWE geometry (N=512, k=4, pfks level 2 /
    base 16) with a synthetic key: the prepared int8-plane path (as built by
    keys.prepare_server_keys) vs the u64 path, and the production js=2
    truncation vs an explicitly plane-dropped u64 key."""
    from tfhe_aes2_tpu.ops import keyswitch as ksw, truncation
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64
    from tfhe_aes2_tpu.ops.torus import split_u64_signed

    p = PARAMS_SQRD_LVL_64
    rng = np.random.default_rng(43)
    k1, n = p.glwe_dimension + 1, p.polynomial_size
    kn1 = 33  # fabricated small input dim (production kN+1=2049 only scales
    # the contraction K axis; the GLWE-side shapes are production)
    key = rng.integers(0, 1 << 64, (kn1, p.pfks_level, k1, k1, n),
                       dtype=np.uint64)
    lwe = rng.integers(0, 1 << 64, (4, kn1), dtype=np.uint64)

    ref = np.asarray(ksw.pfks_all(jnp.asarray(lwe), jnp.asarray(key), p))
    planes = split_u64_signed(jnp.asarray(key))           # [8, ...]
    got = np.asarray(ksw.pfks_all(jnp.asarray(lwe), planes, p))
    np.testing.assert_array_equal(got, ref)

    js = truncation.pfpksk_j_start(p)
    assert js == 1   # budget arm with GLWE key amplification (truncation.py)
    got_t = np.asarray(ksw.pfks_all(jnp.asarray(lwe), planes[js:], p))
    # reconstruct the truncated key in u64 (drop the balanced low planes)
    pl = np.asarray(planes).astype(np.int64)
    key_t = np.zeros_like(key)
    for i in range(js, 8):
        key_t += (pl[i].astype(np.uint64)) << np.uint64(8 * i)
    ref_t = np.asarray(ksw.pfks_all(jnp.asarray(lwe), jnp.asarray(key_t), p))
    np.testing.assert_array_equal(got_t, ref_t)
