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


def test_lane_sharded_intra_block(keys_test):
    """Intra-block sharding (VERDICT r1 #3): the 16-byte axis sharded over
    the 'lane' mesh axis so each device runs a fraction of the per-round GGSW
    circuit bootstraps (the reference's stated serial headroom,
    README.md:70-71). Asserts (a) decrypt-correctness on a (1 block x 8 lane)
    mesh and (b) per-device FLOPs strictly below the replicated path."""
    from tfhe_aes2_tpu.parallel import mesh as mesh_mod

    client, sks = keys_test
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    key = bytes(range(16))
    blocks = ctr_blocks(bytes(8), 1)          # ONE block: latency mode

    ks_ct = fhe_encryption.encrypt_word_array(client, plain.key_schedule(key))
    block_cts = fhe_encryption.encrypt_blocks(client, blocks)

    mesh = mesh_mod.make_mesh(8, lane_shards=8)
    assert mesh.axis_names == ("block", "lane")
    fn = make_sharded_encrypt_blocks_fn(
        fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt, client.params, 1,
        mesh)
    blocks_sharded = jax.device_put(
        jnp.asarray(block_cts), NamedSharding(mesh, mesh_mod.block_spec(mesh)))
    args = (sks_dev, jnp.asarray(ks_ct), blocks_sharded)
    compiled = fn.lower(*args).compile()
    out = compiled(*args)

    got = fhe_encryption.decrypt_blocks(client, np.asarray(out))
    expect = plain.expand_key_and_encrypt_blocks(key, blocks, 1)
    assert got == expect

    # per-device FLOPs: the partitioned module vs a single-device run of the
    # same 1-block batch. The blind-rotate dots shard 8 ways; the linear glue
    # replicates/collects — demand at least a 2x per-device reduction.
    mesh1 = mesh_mod.make_mesh(1)
    fn1 = make_sharded_encrypt_blocks_fn(
        fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt, client.params, 1,
        mesh1)
    blocks1 = jax.device_put(jnp.asarray(block_cts),
                             NamedSharding(mesh1, P("block")))
    compiled1 = fn1.lower(sks_dev, jnp.asarray(ks_ct), blocks1).compile()
    flops_sharded = compiled.cost_analysis()["flops"]
    flops_single = compiled1.cost_analysis()["flops"]
    assert flops_sharded < 0.5 * flops_single, (flops_sharded, flops_single)
