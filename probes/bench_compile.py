"""Probe 15: attribute the key-expansion program's cold compile time.

BENCH_r02 measured 835.6s for `key_schedule_staged`'s first dispatch (incl
compile) vs ~45s for the much larger rounds-scan program — the single
biggest wall-clock item in the pipeline is XLA/Mosaic compile of ONE small
program. This probe cold-compiles (persistent cache redirected to a fresh
tmpdir) each piece of the staged execution separately and prints per-piece
lower/compile seconds:

  ksg     — the full _staged_ks_group program (the 835s suspect)
  sub     — its SBOX cbs alone: bits [4, 8, kN+1] x lut8
  boot    — its boot_word cbs alone: bits [128, 1, kN+1] x identity lut
  scan    — the rounds-scan program at BENCH_BLOCKS blocks (for comparison)
  fin     — the final-round program
  step32 / step128 / step1024 — extprod_step2g Mosaic compile at B=32 /
            128 / 1024 (the three blind-rotate batch geometries above)

Env: BENCH_WHICH (csv of the above), BENCH_BLOCKS (default 8).
Run on the idle TPU only (compile happens on host, but keep runs serial).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    cache = tempfile.mkdtemp(prefix="jaxcache_probe15_")
    os.environ["TFHE_JAX_CACHE"] = cache
    log(f"[compile] cold cache at {cache}")

    import jax
    import jax.numpy as jnp
    import numpy as np

    import tfhe_aes2_tpu  # noqa: F401
    from functools import partial
    from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod, sbox_gal_mul_pbs
    from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext
    from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs_ops
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    p = PARAMS_SQRD_LVL_64
    blocks = int(os.environ.get("BENCH_BLOCKS", "8"))
    which = os.environ.get(
        "BENCH_WHICH", "sub,boot,ksg,scan").split(",")
    strategy = fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt

    log(f"[compile] backend={jax.default_backend()} blocks={blocks}")

    t0 = time.time()
    client, sks = keys_mod.generate_keys(p, seed=3)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), p)
    jax.block_until_ready(sks_dev)
    log(f"[compile] keygen+transfer {time.time()-t0:.1f}s")

    ctx = FheContext(params=p, sks=sks_dev)
    n1 = p.big_lwe_dimension + 1

    def timed_compile(name, fn, *args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        t_lower = time.time() - t0
        t0 = time.time()
        lowered.compile()
        t_comp = time.time() - t0
        log(f"[compile] {name:8s} lower {t_lower:7.1f}s  compile {t_comp:7.1f}s")

    if "sub" in which:
        lut8 = jnp.asarray(sbox_gal_mul_pbs.sbox_lut(ctx))
        bits = jnp.zeros((4, 8, n1), jnp.uint64)
        timed_compile("sub", lambda s, b, l: cbs_ops.circuit_bootstrap_vertical_packing(
            b, l, s, p), sks_dev, bits, lut8)

    if "boot" in which:
        lut1 = jnp.asarray(sbox_gal_mul_pbs.identity_lut(ctx))
        bits = jnp.zeros((128, 1, n1), jnp.uint64)
        timed_compile("boot", lambda s, b, l: cbs_ops.circuit_bootstrap_vertical_packing(
            b, l, s, p), sks_dev, bits, lut1)

    if "ksg" in which:
        base = jnp.zeros((4, 4, 8, n1), jnp.uint64)
        rc = jnp.asarray(np.unpackbits(np.array([1], np.uint8)))
        timed_compile("ksg", partial(fhe_mod._staged_ks_group, strategy, p),
                      sks_dev, base, rc)

    if "scan" in which:
        state = jnp.zeros((blocks, 16, 8, n1), jnp.uint64)
        kgs = jnp.zeros((9, 16, 8, n1), jnp.uint64)
        timed_compile("scan", partial(fhe_mod._staged_rounds_scan, strategy, p),
                      sks_dev, state, kgs)

    if "fin" in which:
        state = jnp.zeros((blocks, 16, 8, n1), jnp.uint64)
        kg = jnp.zeros((16, 8, n1), jnp.uint64)
        timed_compile("fin", partial(fhe_mod._staged_round, strategy, p, True),
                      sks_dev, state, kg)

    for nm, bsz in (("step32", 32), ("step128", 128), ("step1024", 1024)):
        if nm not in which:
            continue
        from tfhe_aes2_tpu.ops import decomposition, torus
        from tfhe_aes2_tpu.ops.pallas import extprod
        k1 = p.glwe_dimension + 1
        n = p.polynomial_size
        n_d = torus.limbs_for_bound(decomposition.digit_bound(p.pbs_base_log))
        js = 8 - int(sks_dev.bsk.shape[3])
        dig = jnp.zeros((k1, p.pbs_level, n_d, bsz, n), jnp.int8)
        ext = jnp.zeros((k1, k1 * p.pbs_level, 8 - js, 2 * n), jnp.int8)
        acc = jnp.zeros((k1, 2, bsz, n), jnp.uint32)
        t = jnp.zeros((bsz,), jnp.int32)
        timed_compile(nm, lambda d, e, a, tt: extprod.extprod_step2g(
            d, e, a, tt, base_log=p.pbs_base_log, levels=p.pbs_level,
            j_start=js, nc_scratch=extprod.use_nc_scratch()),
            dig, ext, acc, t)

    return 0


if __name__ == "__main__":
    sys.exit(main())
