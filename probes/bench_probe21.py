"""probe21 — dispatch-free (slope-timed) in-program cost of the non-scan
stages and the whole middle round at production geometry.

bench_round's per-stage figures each carry a ~20-30ms dispatch/readback
constant (probe20: vp reads 54ms standalone but 25ms slope-timed). This
probe grounds the round budget with lax.scan slope timing:

  ks      — big->small keyswitch of 128·blocks bits
  pfks    — fused pfKS (all k+1 functions)
  extract — sample_extract0 + dual re-layout glue of the cbs front end
  round   — ONE full middle round (cbs + linear layer), scanned

Env: PROBE_B blocks (default 8), PROBE_S0/S1, PROBE_WHICH.
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
    from tfhe_aes2_tpu.ops import blind_rotate as br
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops import keyswitch as ks
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    p = PARAMS_SQRD_LVL_64
    blocks = int(os.environ.get("PROBE_B", "8"))
    s0 = int(os.environ.get("PROBE_S0", "2"))
    s1 = int(os.environ.get("PROBE_S1", "6"))
    which = os.environ.get("PROBE_WHICH", "ks,pfks,round").split(",")

    log(f"[p21] backend={jax.default_backend()} blocks={blocks} scan {s0}/{s1}")
    t0 = time.time()
    client, sks = keys_mod.generate_keys(p, seed=3)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), p)
    jax.block_until_ready(sks_dev)
    log(f"[p21] keygen+transfer {time.time()-t0:.1f}s")

    rng = np.random.default_rng(0)
    nbits = blocks * 128
    big = jnp.asarray(client.encrypt_bits(rng.integers(0, 2, nbits)))

    def slope(name, body, *ops):
        # ops go through jit ARGS (closure capture would embed multi-GB key
        # tensors as HLO constants — the remote Mosaic compile rejects the
        # body with HTTP 413) and the checksum is a FULL sum (a [0] slice
        # lets XLA narrow pure-XLA dots to one output element).
        def run(steps):
            def f(ops, carry, it):
                out = body(it, *ops)
                return carry + jnp.sum(out.astype(jnp.uint32),
                                       dtype=jnp.uint32), None

            def outer(*ops):
                import functools
                return jax.lax.scan(
                    functools.partial(f, ops), jnp.uint32(0),
                    jnp.arange(steps, dtype=jnp.int32))[0]

            fn = jax.jit(outer)
            np.asarray(fn(*ops))
            best = None
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn(*ops))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best

        t_a, t_b = run(s0), run(s1)
        ms = (t_b - t_a) / (s1 - s0) * 1000
        log(f"[p21] {name}: {ms:.2f} ms/call  (scan {s0}={t_a:.3f}s "
            f"{s1}={t_b:.3f}s)")
        return ms

    if "ks" in which:
        slope("ks", lambda it, b, k: ks.keyswitch(
            b + it.astype(jnp.uint64), k, p).astype(jnp.uint32),
            big, sks_dev.ksk)

    dual = jax.jit(lambda b, k: ks.keyswitch(b, k, p))(big, sks_dev.ksk)
    lwe1 = jax.jit(lambda d, k: br.pbs_bit_to_level(
        d, k, p.cbs_base_log, p))(dual, sks_dev.bsk)
    jax.block_until_ready(lwe1)

    if "pfks" in which:
        slope("pfks", lambda it, x, k: ks.pfks_all(
            x + it.astype(jnp.uint64), k, p).astype(jnp.uint32),
            lwe1, sks_dev.pfpksk)

    if "round" in which:
        from tfhe_aes2_tpu.aes_128 import sbox_gal_mul_pbs as pipe
        from tfhe_aes2_tpu.models.shortint_woppbs_1bit import (
            FheContext, fresh_bitct)

        ctx = FheContext(params=p, sks=sks_dev)
        state_arr = big.reshape(blocks, 16, 8, -1)
        key_arr = jnp.asarray(client.encrypt_bits(
            rng.integers(0, 2, nbits)).reshape(blocks, 16, 8, -1))

        def round_body(it, s_arr, k_arr, sks_arg):
            c2 = FheContext(params=p, sks=sks_arg)
            st = fresh_bitct(s_arr + it.astype(jnp.uint64), c2, lane_ndim=2)
            kg = fresh_bitct(k_arr, c2, lane_ndim=2)
            return pipe.middle_round(c2, st, kg).array.astype(jnp.uint32)

        slope("round", round_body, state_arr, key_arr, sks_dev)

    return 0


if __name__ == "__main__":
    sys.exit(main())
