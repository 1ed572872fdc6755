"""Production-parameter noise-margin probe (the `noise-asserts` equivalent).

The reference builds tfhe-rs with the `noise-asserts` feature
(/root/reference/Cargo.toml:10) and ships an empirical noise probe at test
parameters (shortint_woppbs_1bit.rs:699-750). This script is the production
counterpart for the TPU build: it runs the REAL flow — PARAMS_SQRD_LVL_64,
FHE key schedule, full AES-CTR rounds — and measures the decrypted
phase-error distribution of the output bit ciphertexts against the plain
oracle, i.e. the end-to-end noise actually carried into the final decode,
with all limb-plane truncations (ops/truncation.py) active as configured by
the TFHE_*_TRUNC environment.

Asserts (NOISE_ASSERT=0 to disable, e.g. for exploratory runs):
  * keystream decrypts bit-exact vs the independent AES authority;
  * observed error std is >= 8x below the 2^62 decode threshold
    (log2(std) <= 59) — one bad truncation constant eats this first.

Prints ONE JSON line with log2 std / max|err| / margin. Run it twice
(truncations on vs TFHE_BSK_TRUNC=0 TFHE_KSK_TRUNC=0 TFHE_VP_TRUNC=0) to
check the predicted <=2x variance inflation of the budget-arm truncation —
tests/test_noise_margin.py automates exactly that pairing on TPU.

Env: NOISE_BLOCKS (default 8), NOISE_ROUNDS (default 10), NOISE_SEED.
"""

from __future__ import annotations

import json
import os
import sys
import time


def measure(n_blocks: int = 8, rounds: int = 10, seed: int = 11) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401 (x64)
    from tfhe_aes2_tpu.aes_128 import aes_lib, fhe as fhe_mod, fhe_encryption
    from tfhe_aes2_tpu.aes_128 import plain
    from tfhe_aes2_tpu.aes_128.scenario import ctr_blocks
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    params = PARAMS_SQRD_LVL_64
    t0 = time.time()
    client, sks = keys_mod.generate_keys(params, seed=seed)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), params)
    print(f"[noise] keygen+prep {time.time()-t0:.1f}s", file=sys.stderr)

    key = bytes.fromhex("76b8e0ada0f13d90405d6ae55386bd28")
    iv = bytes.fromhex("bdd219b8a08ded1a")
    blocks_clear = ctr_blocks(iv, n_blocks)
    key_ct = fhe_encryption.encrypt_byte_array(client, key)
    block_cts = fhe_encryption.encrypt_blocks(client, blocks_clear)

    strategy = fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt
    ctx = FheContext(params=params, sks=sks_dev)

    t0 = time.time()
    eks = fhe_mod.key_schedule_staged(strategy, ctx, jnp.asarray(key_ct))
    out = fhe_mod.encrypt_blocks_staged(strategy, ctx, eks,
                                        jnp.asarray(block_cts), rounds)
    out = np.asarray(out.array)            # [blocks, 16, 8, kN+1]
    print(f"[noise] {rounds}-round run {time.time()-t0:.1f}s", file=sys.stderr)

    if rounds == 10:
        expect = aes_lib.encrypt_blocks(key, blocks_clear)
    else:
        expect = plain.expand_key_and_encrypt_blocks(key, blocks_clear,
                                                     rounds)
    got = fhe_encryption.decrypt_blocks(client, out)
    verified = got == expect

    # expected torus encodings: bit at 2^63, MSB-first within each byte
    exp_bytes = np.frombuffer(b"".join(expect), np.uint8).reshape(
        n_blocks, 16)
    exp_bits = np.unpackbits(exp_bytes[..., None], axis=-1)  # [B, 16, 8]
    enc = exp_bits.astype(np.uint64) << np.uint64(63)

    phase = client.decrypt_phase(out)                        # [B, 16, 8]
    err = (phase - enc).astype(np.int64).astype(np.float64)  # centered signed
    std = float(err.std())
    max_abs = float(np.abs(err).max())
    res = {
        "params": "sqrd_lvl_64",
        "blocks": n_blocks,
        "rounds": rounds,
        "samples": int(err.size),
        "verified": bool(verified),
        "log2_std": round(float(np.log2(std)), 2),
        "log2_max_abs_err": round(float(np.log2(max_abs)), 2),
        "decode_margin_stds": round((1 << 62) / std, 1),
        "variance": std * std,
        "trunc_env": {k: os.environ.get(k, "1") for k in
                      ("TFHE_BSK_TRUNC", "TFHE_KSK_TRUNC", "TFHE_VP_TRUNC")},
    }
    return res


def main() -> int:
    res = measure(int(os.environ.get("NOISE_BLOCKS", "8")),
                  int(os.environ.get("NOISE_ROUNDS", "10")),
                  int(os.environ.get("NOISE_SEED", "11")))
    print(json.dumps(res))
    if os.environ.get("NOISE_ASSERT", "1") != "0":
        assert res["verified"], "keystream failed verification"
        assert res["log2_std"] <= 59.0, (
            f"noise margin regression: log2(std)={res['log2_std']} > 59 "
            "(decode threshold 2^62 / safety 8)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
