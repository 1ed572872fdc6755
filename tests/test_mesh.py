"""Mesh-sharded AES entry points (parallel/mesh.py).

Guards the sharded wrappers the per-round driver exercises via
__graft_entry__.dryrun_multichip: block-batch sharding over a device mesh
with replicated evaluation keys (SURVEY.md §2.4/2.5 TPU mapping of the
reference's rayon block parallelism, src/bin/main.rs:141-159).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod, fhe_encryption, plain
from tfhe_aes2_tpu.aes_128.scenario import ctr_blocks
from tfhe_aes2_tpu.parallel import make_mesh, make_sharded_encrypt_blocks_fn


def test_sharded_encrypt_blocks_matches_oracle(keys_test):
    client, sks = keys_test
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    key = bytes(range(16))
    blocks = ctr_blocks(bytes(8), 4)

    ks_ct = fhe_encryption.encrypt_word_array(client, plain.key_schedule(key))
    block_cts = fhe_encryption.encrypt_blocks(client, blocks)

    mesh = make_mesh(2)
    fn = make_sharded_encrypt_blocks_fn(
        fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt, client.params, 1, mesh)
    blocks_sharded = jax.device_put(
        jnp.asarray(block_cts), NamedSharding(mesh, P("block")))
    out = fn(sks_dev, jnp.asarray(ks_ct), blocks_sharded)

    got = fhe_encryption.decrypt_blocks(client, np.asarray(out))
    expect = plain.expand_key_and_encrypt_blocks(key, blocks, 1)
    assert got == expect
