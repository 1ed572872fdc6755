"""Cumulative-stage dissection of one production AES round.

Each program extends the previous by one stage and returns a single u32
checksum, so the (large, constant) tunnel-readback overhead cancels in the
deltas:

  ks        -- big->small keyswitch of all 128*blocks bits
  +pbs      -- + scaling PBS (677-step blind rotate)
  +pfks     -- + fused pfKS (GGSW assembly)
  +vp       -- + vertical packing of the 8->24 LUT
  +round    -- the full middle_round (adds shift_rows/mix_columns/ARK glue)

Env: BENCH_BLOCKS (default 4), BENCH_ITERS (default 3), BENCH_WHICH (csv).
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
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64
    from tfhe_aes2_tpu.ops import blind_rotate as br
    from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs_ops
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops import keyswitch as ks

    p = PARAMS_SQRD_LVL_64
    blocks = int(os.environ.get("BENCH_BLOCKS", "4"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))
    which = os.environ.get("BENCH_WHICH", "ks,pbs,pfks,vp,round").split(",")

    log(f"[cumul] backend={jax.default_backend()} blocks={blocks}")

    t0 = time.time()
    client, sks = keys_mod.generate_keys(p, seed=3)
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    jax.block_until_ready(sks_dev)
    log(f"[cumul] keygen+transfer {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    nbits = blocks * 128
    big = jnp.asarray(client.encrypt_bits(rng.integers(0, 2, nbits)))
    lut24 = jnp.asarray(cbs_ops.generate_lut(
        8, 24, lambda v: int(rng.integers(0, 1 << 24)), p))

    def checksum(x):
        return jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda t: t.astype(jnp.uint32).sum() if t.dtype != jnp.uint32
                else t.sum(), x))

    def timed(name, fn, *args):
        f = jax.jit(fn)
        t0 = time.time()
        np.asarray(f(*args))
        t_first = time.time() - t0
        dts = []
        for i in range(iters):
            a = list(args)
            a[-1] = a[-1] + jnp.asarray(i + 1, a[-1].dtype)
            jax.block_until_ready(a[-1])
            t0 = time.time()
            np.asarray(f(*a))
            dts.append(time.time() - t0)
        dt = min(dts)
        log(f"[cumul] {name:8s} first {t_first:6.1f}s  steady {dt*1000:9.2f}ms")
        return dt

    results = {}
    if "ks" in which:
        results["ks"] = timed(
            "ks", lambda s, b: checksum(ks.keyswitch(b, s.ksk, p)),
            sks_dev, big)

    if "pbs" in which:
        def f_pbs(s, b):
            dual = ks.keyswitch(b, s.ksk, p)
            return checksum(br.pbs_bit_to_level(dual, s.bsk, p.cbs_base_log, p))
        results["pbs"] = timed("+pbs", f_pbs, sks_dev, big)

    if "pfks" in which:
        def f_pfks(s, b):
            return checksum(cbs_ops.circuit_bootstrap_bits(b, s, p))
        results["pfks"] = timed("+pfks", f_pfks, sks_dev, big)

    if "vp" in which:
        def f_vp(s, b):
            bb = b.reshape(blocks, 16, 8, -1)
            return checksum(cbs_ops.circuit_bootstrap_vertical_packing(
                bb, lut24, s, p))
        results["vp"] = timed("+vp", f_vp, sks_dev, big)

    if "round" in which:
        from tfhe_aes2_tpu.aes_128 import sbox_gal_mul_pbs as pipe
        from tfhe_aes2_tpu.models.shortint_woppbs_1bit import (
            FheContext, fresh_bitct)
        key_arr = jnp.asarray(client.encrypt_bits(
            rng.integers(0, 2, nbits)).reshape(blocks, 16, 8, -1))

        def f_round(s, b):
            ctx = FheContext(params=p, sks=s)
            st = fresh_bitct(b.reshape(blocks, 16, 8, -1), ctx, lane_ndim=2)
            kg = fresh_bitct(key_arr, ctx, lane_ndim=2)
            return checksum(pipe.middle_round(ctx, st, kg).array)
        results["round"] = timed("+round", f_round, sks_dev, big)

    keys_order = [k for k in ("ks", "pbs", "pfks", "vp", "round") if k in results]
    prev = 0.0
    for k in keys_order:
        log(f"[cumul] delta {k:8s} {1000*(results[k]-prev):9.2f}ms")
        prev = results[k]
    return 0


if __name__ == "__main__":
    sys.exit(main())
