"""Dissect one production AES round on the accelerator: where does the time go?

Times, at lvl64 shapes with BENCH_BLOCKS blocks (default 4):
  ks     — big->small keyswitch of all 128·blocks bits
  pbs    — scaling PBS (full 677-step blind rotate) of all bits
  pfks   — fused pfKS (all k+1 functions) of the PBS outputs
  ggsw   — ks + pbs + pfks (the full circuit-bootstrap front end)
  vp     — vertical packing of the 8->24 LUT under the GGSWs
  cbs    — full circuit_bootstrap_vertical_packing
  round  — full middle_round (cbs + shift_rows + mix_columns + AddRoundKey)

Env: BENCH_BLOCKS, BENCH_WHICH (csv), BENCH_ITERS (default 3).

MEASUREMENT CAVEAT (round 4): these standalone per-dispatch figures each
carry a ~20-30ms dispatch/readback constant through the tunnel — probe20/21
slope-timed the same stages INSIDE a compiled program at 2-30x lower cost
(vp 54 standalone vs 25.2 in-program; ks 23 vs ~1). Use the probes for
attribution; use this script only for coarse regression spotting.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops.params import (PARAMS_SQRD_LVL_64,
                                          PARAMS_SQRD_LVL_64_MXU)
    from tfhe_aes2_tpu.ops import blind_rotate as br
    from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs_ops
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops import keyswitch as ks

    p = (PARAMS_SQRD_LVL_64_MXU
         if os.environ.get("BENCH_PARAMS") == "lvl64mxu"
         else PARAMS_SQRD_LVL_64)
    blocks = int(os.environ.get("BENCH_BLOCKS", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    which = os.environ.get(
        "BENCH_WHICH", "ks,pbs,pfks,vp,cbs,round").split(",")

    log(f"[round] backend={jax.default_backend()} blocks={blocks} "
        f"N={p.polynomial_size} k={p.glwe_dimension} n={p.lwe_dimension}")

    t0 = time.time()
    client, sks = keys_mod.generate_keys(p, seed=3)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), p)
    jax.block_until_ready(sks_dev)
    log(f"[round] keygen+transfer {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    nbits = blocks * 128
    bits = rng.integers(0, 2, nbits)
    big = jnp.asarray(client.encrypt_bits(bits))           # [nbits, kN+1]
    lut24 = cbs_ops.generate_lut(
        8, 24, lambda v: rng.integers(0, 1 << 24), p)

    def timed(name, fn, *args, vary=0):
        # vary one data arg per iteration (defeats any result caching) and
        # read back only a u32 checksum: stage outputs are tens of MB and
        # tunnel readback variance (~hundreds of ms) would swamp the signal.
        def fn_sum(*a):
            leaves = jax.tree_util.tree_leaves(fn(*a))
            return sum(jnp.sum(x.astype(jnp.uint32)) for x in leaves)

        f = jax.jit(fn_sum)
        t0 = time.time()
        np.asarray(jax.tree_util.tree_leaves(f(*args))[0])
        t_first = time.time() - t0
        dts = []
        for i in range(iters):
            a = list(args)
            a[vary] = jax.tree_util.tree_map(
                lambda x: x + jnp.asarray(i + 1, x.dtype), a[vary])
            jax.block_until_ready(a[vary])
            t0 = time.time()
            np.asarray(jax.tree_util.tree_leaves(f(*a))[0])
            dts.append(time.time() - t0)
        dt = min(dts)
        log(f"[round] {name:6s} first {t_first:6.1f}s  steady {dt*1000:9.2f}ms")
        return dt

    if "ks" in which:
        timed("ks", lambda k, b: ks.keyswitch(b, k, p), sks_dev.ksk, big, vary=1)

    dual = jax.jit(lambda k, b: ks.keyswitch(b, k, p))(sks_dev.ksk, big)
    jax.block_until_ready(dual)

    if "pbs" in which:
        timed("pbs", lambda k, d: br.pbs_bit_to_level(
            d, k, p.cbs_base_log, p), sks_dev.bsk, dual, vary=1)

    lwe1 = jax.jit(lambda k, d: br.pbs_bit_to_level(
        d, k, p.cbs_base_log, p))(sks_dev.bsk, dual)
    jax.block_until_ready(lwe1)

    if "pfks" in which:
        timed("pfks", lambda k, x: ks.pfks_all(x, k, p), sks_dev.pfpksk, lwe1, vary=1)

    ggsw = jax.jit(
        lambda s, b: cbs_ops.circuit_bootstrap_bits(b, s, p))(sks_dev, big)
    ggsw = jax.block_until_ready(ggsw)
    ggsw_b = ggsw.reshape((blocks, 16, 8) + ggsw.shape[1:])

    if "vp" in which:
        timed("vp", lambda g, l: cbs_ops.vertical_packing(
            g, l, p), ggsw_b, jnp.asarray(lut24), vary=0)

    if "cbs" in which:
        big_b = big.reshape(blocks, 16, 8, -1)
        timed("cbs", lambda s, b, l: cbs_ops.circuit_bootstrap_vertical_packing(
            b, l, s, p), sks_dev, big_b, jnp.asarray(lut24), vary=1)

    if "round" in which:
        from tfhe_aes2_tpu.aes_128 import sbox_gal_mul_pbs as pipe
        from tfhe_aes2_tpu.models.shortint_woppbs_1bit import (
            FheContext, fresh_bitct)

        ctx = FheContext(params=p, sks=sks_dev)
        state_arr = big.reshape(blocks, 16, 8, -1)
        key_arr = jnp.asarray(client.encrypt_bits(
            rng.integers(0, 2, nbits)).reshape(blocks, 16, 8, -1))

        def round_fn(s, s_arr, k_arr):
            c2 = FheContext(params=p, sks=s)
            st = fresh_bitct(s_arr, c2, lane_ndim=2)
            kg = fresh_bitct(k_arr, c2, lane_ndim=2)
            return pipe.middle_round(c2, st, kg).array

        timed("round", round_fn, sks_dev, state_arr, key_arr, vary=1)

    return 0


if __name__ == "__main__":
    sys.exit(main())
