"""Benchmark: FHE AES-128 CTR blocks/sec on the available accelerator.

Runs the production parameter set (sqrd_lvl_64 — the reference's submitted
configuration, main.rs:83) end-to-end: FHE key expansion + batched CTR block
encryption, decrypt-verified against the independent AES authority, then
prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers, and the Rust toolchain needed
to measure it does not exist in this image — the 1x mark is a LITERATURE
ESTIMATE of 1/240 blocks/s (4 min/block), the order of magnitude reported
for tfhe-rs WoP-PBS AES-128 implementations of this bounty generation on a
multi-core CPU. BASELINE.md ("Provenance of the 1× mark") documents the
sources and the uncertainty; the JSON labels it via the "baseline" field.

Env knobs: BENCH_BLOCKS (default 16 = two 1024-lane batch tiles — measured
0.7353 blocks/s vs 0.7310 at 8; the single-2048-tile variant loses to VMEM
pressure, PERF.md), BENCH_PARAMS (lvl64|lvl64mxu|test), BENCH_ROUNDS, BENCH_REPS,
BENCH_COMPRESS (default 16: the timed region includes server-side output
compression to q'=2^16 and the client verifies the compressed response —
the serving configuration; 0 restores the raw big-key output for comparison
with the pre-compression PERF.md rows).
"""

from __future__ import annotations

import json
import os
import sys
import time


BASELINE_BLOCKS_PER_S = 1.0 / 240.0


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401 (x64)
    from tfhe_aes2_tpu.aes_128 import aes_lib, fhe as fhe_mod, fhe_encryption
    from tfhe_aes2_tpu.aes_128.scenario import ctr_blocks
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops.params import (
        PARAMS_SQRD_LVL_64, PARAMS_SQRD_LVL_64_MXU, PARAMS_TEST_N256)

    n_blocks = int(os.environ.get("BENCH_BLOCKS", "16"))
    which = os.environ.get("BENCH_PARAMS", "lvl64")
    rounds = int(os.environ.get("BENCH_ROUNDS", "10"))
    # BENCH_COMPRESS (default 16, 0 disables): the server response is
    # keyswitched to the small key and modulus-switched to q'=2^N
    # (ops/compression.py) INSIDE the timed region, and the client decrypts
    # the compressed cts. This is the realistic serving configuration; it
    # also shrinks the response readback 12x, which matters here because the
    # TPU sits behind a tunnel where a 16.8MB readback costs ~0.3s that a
    # locally-attached accelerator would not pay. The JSON labels the mode.
    compress = int(os.environ.get("BENCH_COMPRESS", "16"))
    params = {"lvl64": PARAMS_SQRD_LVL_64, "lvl64mxu": PARAMS_SQRD_LVL_64_MXU,
              "test": PARAMS_TEST_N256}[which]

    print(f"[bench] backend={jax.default_backend()} devices={jax.devices()} "
          f"params={which} blocks={n_blocks} rounds={rounds}", file=sys.stderr)

    t0 = time.time()
    client, sks = keys_mod.generate_keys(params, seed=11)
    print(f"[bench] keygen {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), params)
    jax.block_until_ready(sks_dev)
    print(f"[bench] key transfer {time.time()-t0:.1f}s", file=sys.stderr)

    key = bytes.fromhex("76b8e0ada0f13d90405d6ae55386bd28")
    iv = bytes.fromhex("bdd219b8a08ded1a")
    blocks_clear = ctr_blocks(iv, n_blocks)
    key_ct = fhe_encryption.encrypt_byte_array(client, key)
    block_cts = fhe_encryption.encrypt_blocks(client, blocks_clear)

    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext
    strategy = fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt
    ctx = FheContext(params=params, sks=sks_dev)

    # key expansion (timed separately — main.rs:130-139)
    t0 = time.time()
    eks = fhe_mod.key_schedule_staged(strategy, ctx, jnp.asarray(key_ct))
    np.asarray(eks.array)
    t_expand = time.time() - t0
    print(f"[bench] key expansion (incl compile) {t_expand:.1f}s", file=sys.stderr)

    if compress:
        from functools import partial
        from tfhe_aes2_tpu.ops import compression
        compress_fn = jax.jit(partial(compression.compress_bits,
                                      params=params, log2q=compress))

    def run_once():
        out = fhe_mod.encrypt_blocks_staged(strategy, ctx, eks, blocks_dev,
                                            rounds)
        if compress:
            return np.asarray(compress_fn(out.array, ctx.sks))
        return np.asarray(out.array)   # materialize on host: tunnel-safe sync

    blocks_dev = jnp.asarray(block_cts)
    t0 = time.time()
    out = run_once()
    t_first = time.time() - t0
    print(f"[bench] blocks first run (incl compile) {t_first:.1f}s", file=sys.stderr)

    # steady-state timing: 5 reps with stall rejection — the tunneled device
    # shows ±8% run-to-run variance plus rare multi-x stalls (one recorded
    # 237s outlier, commit a9387e4). Reps >1.5x the median are dropped as
    # stalls; the figure is the mean of the survivors (BENCH_REPS overrides).
    reps = []
    for rep in range(int(os.environ.get("BENCH_REPS", "5"))):
        t0 = time.time()
        out = run_once()
        dt = time.time() - t0
        print(f"[bench] steady rep{rep} {dt:.2f}s", file=sys.stderr)
        reps.append(dt)
    med = sorted(reps)[len(reps) // 2]
    kept = [r for r in reps if r <= 1.5 * med]
    t_steady = sum(kept) / len(kept)
    blocks_per_s = n_blocks / t_steady
    print(f"[bench] steady mean {t_steady:.2f}s over {len(kept)}/{len(reps)} "
          f"reps (median {med:.2f}, spread {min(reps):.2f}-{max(reps):.2f}) "
          f"-> {blocks_per_s:.4f} blocks/s", file=sys.stderr)

    # verify correctness (10-round only)
    if rounds == 10:
        if compress:
            got = compression.decrypt_blocks_compressed(client, out, compress)
        else:
            got = fhe_encryption.decrypt_blocks(client, np.asarray(out))
        expect = aes_lib.encrypt_blocks(key, blocks_clear)
        ok = got == expect
        print(f"[bench] verification vs AES authority: {ok}", file=sys.stderr)
        if not ok:
            print(json.dumps({"metric": "fhe_aes128_ctr_blocks_per_s",
                              "value": 0.0, "unit": "blocks/s",
                              "vs_baseline": 0.0, "error": "verify_failed"}))
            return 1

    # secondary metric (BASELINE.md targets table): 8-bit circuit bootstraps
    # per second — 16 SBOX bootstraps per block per round (the final round's
    # sub_bytes included; rounds 1..9 use the 8->24 gal-mul variant).
    cbs_per_s = n_blocks * 16 * rounds / t_steady
    print(json.dumps({
        "metric": "fhe_aes128_ctr_blocks_per_s",
        "value": round(blocks_per_s, 5),
        "unit": "blocks/s",
        "vs_baseline": round(blocks_per_s / BASELINE_BLOCKS_PER_S, 3),
        "baseline": "literature-estimate-1/240-blocks-per-s",
        "secondary": {"circuit_bootstraps_per_s": round(cbs_per_s, 2)},
        "output": (f"compressed-q{compress}" if compress else "raw-big-key"),
        "reps_s": [round(r, 3) for r in reps],
        "reps_kept": len(kept),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
