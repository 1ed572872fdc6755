"""AOT warm-up of the staged production programs (tfhe_aes2_tpu/aot.py).

Pins that the thread-pool-compiled executables (a) are actually used by the
staged path under the exact kernel-cache keys, (b) produce output identical
to the plain jit path, and (c) degrade to the jit fallback when a program
fails to compile.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu import aot
from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod, fhe_encryption, plain
from tfhe_aes2_tpu.aes_128.scenario import ctr_blocks
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import FheContext

STRATEGY = fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt


def test_aot_staged_end_to_end(keys_test):
    client, sks = keys_test
    params = client.params
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    n_blocks, rounds = 2, 2

    handle = aot.warmup_staged(STRATEGY, params, n_blocks, rounds, compress=0,
                               artifact_dir="0")
    ctx = FheContext(params=params, sks=sks_dev)
    handle.attach(ctx)
    # the staged kernels must resolve to the AOT pending wrappers
    assert isinstance(ctx._cbs_kernel_cache["ks_subxor"], aot._Pending)
    n1 = params.big_lwe_dimension + 1
    assert ("rounds_scan", (n_blocks, 16, 8, n1), rounds) \
        in ctx._cbs_kernel_cache

    key = bytes(range(16))
    key_ct = fhe_encryption.encrypt_byte_array(client, key)
    blocks = ctr_blocks(bytes(8), n_blocks)
    block_cts = fhe_encryption.encrypt_blocks(client, blocks)

    eks = fhe_mod.key_schedule_staged(STRATEGY, ctx, jnp.asarray(key_ct))
    out = fhe_mod.encrypt_blocks_staged(STRATEGY, ctx, eks,
                                        jnp.asarray(block_cts), rounds)
    handle.wait(timeout=600)

    got = fhe_encryption.decrypt_blocks(client, np.asarray(out.array))
    expect = plain.expand_key_and_encrypt_blocks(key, blocks, rounds)
    assert got == expect

    # same arrays as the un-warmed jit path (deterministic server compute)
    ctx2 = FheContext(params=params, sks=sks_dev)
    eks2 = fhe_mod.key_schedule_staged(STRATEGY, ctx2, jnp.asarray(key_ct))
    out2 = fhe_mod.encrypt_blocks_staged(STRATEGY, ctx2, eks2,
                                         jnp.asarray(block_cts), rounds)
    np.testing.assert_array_equal(np.asarray(out.array),
                                  np.asarray(out2.array))


def test_aot_artifact_roundtrip(keys_test, tmp_path):
    """dump() then a fresh warmup loads the serialized executables (no
    recompile) and they produce identical output; a manifest mismatch falls
    back to compilation."""
    import json

    client, sks = keys_test
    params = client.params
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    adir = str(tmp_path / "aot")

    h1 = aot.warmup_staged(STRATEGY, params, 2, 2, compress=0,
                           artifact_dir=adir)
    h1.wait(timeout=600)
    aot.dump(h1)
    names = {aot._slug(k) for k in h1.entries}
    assert all((tmp_path / "aot" / (n + ".jaxexe")).exists() for n in names)

    h2 = aot.warmup_staged(STRATEGY, params, 2, 2, compress=0,
                           artifact_dir=adir)
    h2.wait(timeout=600)
    key_ct = fhe_encryption.encrypt_byte_array(client, bytes(range(16)))
    g = jnp.asarray(key_ct).reshape(4, 4, 8, -1)
    np.testing.assert_array_equal(
        np.asarray(h2.entries["ks_boot"](sks_dev, g)),
        np.asarray(h1.entries["ks_boot"](sks_dev, g)))

    # stale manifest (different env fingerprint) -> recompile, still correct
    mpath = tmp_path / "aot" / "ks_boot.json"
    m = json.loads(mpath.read_text())
    m["env"]["TFHE_BR_KERNEL"] = "something-else"
    mpath.write_text(json.dumps(m))
    h3 = aot.warmup_staged(STRATEGY, params, 2, 2, compress=0,
                           artifact_dir=adir)
    np.testing.assert_array_equal(
        np.asarray(h3.entries["ks_boot"](sks_dev, g)),
        np.asarray(h1.entries["ks_boot"](sks_dev, g)))


def test_aot_fallback_on_compile_failure(keys_test):
    """A _Pending whose future fails must fall back to the jit path."""
    from concurrent.futures import Future

    client, sks = keys_test
    params = client.params
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)

    boom = Future()
    boom.set_exception(RuntimeError("synthetic AOT failure"))
    import functools
    make = lambda: jax.jit(functools.partial(fhe_mod._staged_ks_boot,
                                             STRATEGY, params))
    pending = aot._Pending("ks_boot", boom, make)

    ctx = FheContext(params=params, sks=sks_dev)
    key_ct = fhe_encryption.encrypt_byte_array(client, bytes(range(16)))
    group = jnp.asarray(key_ct).reshape(4, 4, 8, -1)
    expect = make()(sks_dev, group)
    got = pending(sks_dev, group)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expect))
