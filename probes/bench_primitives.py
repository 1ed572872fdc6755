"""Per-primitive TPU benchmark: compile+run times for each WoP-PBS stage.

Prints per-stage progress to stderr (tunnel-safe host-materialization syncs).
Env: BP_PARAMS (lvl64|test), BP_BATCH (default 128).
"""

from __future__ import annotations

import os
import sys
import time


def log(msg):
    print(f"[prim {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops import blind_rotate as br
    from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops import keyswitch as ksw
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64, PARAMS_TEST_N256

    which = os.environ.get("BP_PARAMS", "lvl64")
    batch = int(os.environ.get("BP_BATCH", "128"))
    p = {"lvl64": PARAMS_SQRD_LVL_64, "test": PARAMS_TEST_N256}[which]
    log(f"backend={jax.default_backend()} params={which} batch={batch}")

    t0 = time.time()
    client, sks = keys_mod.generate_keys(p, seed=5)
    log(f"keygen {time.time()-t0:.1f}s")
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)

    # warm the device with a trivial op
    t0 = time.time()
    x = jnp.asarray(np.arange(16, dtype=np.uint64))
    np.asarray(jax.jit(lambda v: v * jnp.uint64(3))(x))
    log(f"trivial jit roundtrip {time.time()-t0:.1f}s")

    bits = np.zeros(batch, dtype=np.uint8)
    cts = jnp.asarray(client.encrypt_bits(bits))
    log(f"input cts {cts.shape}")

    def bench(name, fn, *args, reps=2):
        f = jax.jit(fn)
        t0 = time.time()
        out = np.asarray(jax.block_until_ready(f(*args)))
        log(f"{name}: first (compile+run) {time.time()-t0:.1f}s")
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = np.asarray(jax.block_until_ready(f(*args)))
            ts.append(time.time() - t0)
        log(f"{name}: steady {min(ts):.3f}s")
        return jnp.asarray(out)

    dual = bench("keyswitch", lambda c: ksw.keyswitch(c, sks_dev.ksk, p), cts)
    big = bench("pbs (blind rotate n=%d)" % p.lwe_dimension,
                lambda c: br.pbs_bit_to_level(c, sks_dev.bsk, p.cbs_base_log, p),
                dual)
    bench("pfks", lambda c: ksw.pfks(c, sks_dev.pfpksk[0], p), big)

    byte_cts = cts.reshape(batch // 8, 8, -1)
    from tfhe_aes2_tpu.aes_128 import SBOX
    lut = cbs.generate_lut(8, 24, lambda b: int(SBOX[b]) * 65793, p)  # 8->24
    bench("full cbs+vp (8->24)",
          lambda c, l: cbs.circuit_bootstrap_vertical_packing(c, l, sks_dev, p),
          byte_cts, jnp.asarray(lut), reps=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
