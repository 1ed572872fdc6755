"""probe22 — warm-start attribution: where do the 38s of warm key expansion
(42.5s warm vs 4.1s steady, PERF.md) actually go, and does parallel AOT
compilation (persistent-cache deserialization) remove them?

Phases timed, fresh process, warm persistent cache:
  import     — jax + package import, backend init
  keygen     — client+server keygen (host numpy)
  transfer   — prepare_server_keys + device put
  aotN       — .lower(shapes).compile() per production program
               (PROBE_PAR=1: all programs in a thread pool)
  dispatch   — first real dispatch of each program (executable load)
  steady     — second dispatch

Programs: ks_subxor, ks_boot, rounds_scan(B), round_fin(B), compress.
Env: PROBE_BLOCKS (default 16), PROBE_PAR (default 1).
"""

from __future__ import annotations

import os
import sys
import time

t_start = time.time()


def log(msg):
    print(f"[p22 +{time.time()-t_start:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401
    from functools import partial

    from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod
    from tfhe_aes2_tpu.ops import compression
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    log(f"import done, backend={jax.default_backend()}")
    p = PARAMS_SQRD_LVL_64
    blocks = int(os.environ.get("PROBE_BLOCKS", "16"))
    par = os.environ.get("PROBE_PAR", "1") == "1"
    strategy = fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt

    t0 = time.time()
    client, sks = keys_mod.generate_keys(p, seed=11)
    log(f"keygen {time.time()-t0:.1f}s")
    t0 = time.time()
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), p)
    jax.block_until_ready(sks_dev)
    log(f"transfer {time.time()-t0:.1f}s")

    n1 = p.big_lwe_dimension + 1
    sd = lambda *s: jax.ShapeDtypeStruct(s, jnp.uint64)
    sks_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), sks_dev)

    progs = {
        "ks_subxor": (jax.jit(partial(fhe_mod._staged_ks_subxor, strategy, p)),
                      (sks_shapes, sd(4, 4, 8, n1),
                       jax.ShapeDtypeStruct((8,), jnp.uint8))),
        "ks_boot": (jax.jit(partial(fhe_mod._staged_ks_boot, strategy, p)),
                    (sks_shapes, sd(4, 4, 8, n1))),
        "rounds_scan": (jax.jit(partial(fhe_mod._staged_rounds_scan, strategy,
                                        p)),
                        (sks_shapes, sd(blocks, 16, 8, n1),
                         sd(9, 16, 8, n1))),
        "round_fin": (jax.jit(partial(fhe_mod._staged_round, strategy, p,
                                      True)),
                      (sks_shapes, sd(blocks, 16, 8, n1), sd(16, 8, n1))),
        "compress": (jax.jit(partial(compression.compress_bits, params=p,
                                     log2q=16)),
                     (sd(blocks, 16, 8, n1), sks_shapes)),
    }

    compiled = {}

    def aot(name):
        fn, shapes = progs[name]
        t0 = time.time()
        lowered = fn.lower(*shapes)
        t_low = time.time()
        compiled[name] = lowered.compile()
        log(f"aot {name}: lower {t_low-t0:.1f}s compile {time.time()-t_low:.1f}s")

    t0 = time.time()
    if par:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(len(progs)) as ex:
            list(ex.map(aot, progs))
    else:
        for name in progs:
            aot(name)
    log(f"AOT total ({'par' if par else 'serial'}) {time.time()-t0:.1f}s")

    # real args
    rng = np.random.default_rng(0)
    key_ct = jnp.asarray(client.encrypt_bits(
        rng.integers(0, 2, 128)).reshape(4, 4, 8, n1))
    rc = jnp.asarray(np.unpackbits(np.array([1], np.uint8)))
    state = jnp.asarray(client.encrypt_bits(
        rng.integers(0, 2, blocks * 128)).reshape(blocks, 16, 8, n1))
    kgs = jnp.asarray(client.encrypt_bits(
        rng.integers(0, 2, 9 * 128)).reshape(9, 16, 8, n1))
    kg1 = jnp.asarray(client.encrypt_bits(
        rng.integers(0, 2, 128)).reshape(16, 8, n1))

    args = {
        "ks_subxor": (sks_dev, key_ct, rc),
        "ks_boot": (sks_dev, key_ct),
        "rounds_scan": (sks_dev, state, kgs),
        "round_fin": (sks_dev, state, kg1),
    }
    args["compress"] = (state, sks_dev)

    for rep in ("dispatch", "steady"):
        for name in progs:
            t0 = time.time()
            out = compiled[name](*args[name])
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            log(f"{rep} {name}: {time.time()-t0:.2f}s")

    log("total")
    return 0


if __name__ == "__main__":
    sys.exit(main())
