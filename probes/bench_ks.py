"""Probe 16: key-expansion wall time, cold vs warm (VERDICT r3 #2).

Times exactly the bench's key-expansion phase (key_schedule_staged at
production parameters). Run twice with TFHE_JAX_CACHE pointed at the same
fresh dir: first run = cold (compile), second = warm (deserialize+dispatch).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod, fhe_encryption
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    p = PARAMS_SQRD_LVL_64
    print(f"[ks] backend={jax.default_backend()} "
          f"cache={jax.config.jax_compilation_cache_dir}", file=sys.stderr)
    t0 = time.time()
    client, sks = keys_mod.generate_keys(p, seed=11)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), p)
    jax.block_until_ready(sks_dev)
    print(f"[ks] keygen+transfer {time.time()-t0:.1f}s", file=sys.stderr)

    key_ct = fhe_encryption.encrypt_byte_array(client, bytes(range(16)))
    ctx = FheContext(params=p, sks=sks_dev)
    strategy = fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt
    t0 = time.time()
    eks = fhe_mod.key_schedule_staged(strategy, ctx, jnp.asarray(key_ct))
    np.asarray(eks.array)
    print(f"[ks] key expansion (incl compile) {time.time()-t0:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    eks = fhe_mod.key_schedule_staged(strategy, ctx, jnp.asarray(key_ct))
    np.asarray(eks.array)
    print(f"[ks] key expansion (steady, in-process) {time.time()-t0:.1f}s",
          file=sys.stderr)

    # sanity: decrypting the expanded key reproduces the clear schedule
    from tfhe_aes2_tpu.aes_128 import plain
    got = client.decrypt_bits(np.asarray(eks.array))
    expect = np.unpackbits(
        np.frombuffer(b"".join(plain.key_schedule(bytes(range(16)))),
                      np.uint8).reshape(44, 4)[..., None], axis=-1)
    assert (got == expect).all(), "expanded key mismatch"
    print("[ks] verified vs clear schedule", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
