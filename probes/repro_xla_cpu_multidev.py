"""Minimized repro: XLA:CPU multi-virtual-device numerical corruption.

Found by the round-4 executed production multichip gate (multichip_gate.py):
at PARAMS_SQRD_LVL_64 with XLA_FLAGS=--xla_force_host_platform_device_count=4,
the composition (677-step blind-rotate scan) -> (pfKS f64 limb matmul) under
ANY 4-device layout — 4-way lane sharding, 2x2, even zero-collective pure
block-DP — produces wrong values, while:

  * every stage is bit-exact in isolation under the same shardings,
  * the same program is correct at 1 and 2 devices,
  * the same program is correct at 4+ devices with small (test) parameters,
  * the unsharded lvl64 program is correct,
  * the TPU (pallas) production path decrypt-verifies at 16 blocks.

Corruption signature: ONE device's shard of the pfKS output, all its rows,
a CONTIGUOUS ~200-column panel of the first 512 output columns (the first
pfks function's first GLWE polynomial), garbage values; WHICH device varies
between processes (scheduling-dependent) => a runtime race, not a
partitioner miscompile. jax.lax.optimization_barrier, sharding constraints
(lane-sharded or fully replicated boundary), --xla_cpu_use_thunk_runtime=
false and --xla_cpu_multi_thread_eigen=false all do NOT fix it.

Consequences for this repo: the executed CPU-mesh production gate runs at 2
devices (multichip_gate.py default; verified); the driver dryrun's lvl64
check stays compile-only by default. Real multi-chip deployment is TPU,
where none of this CPU runtime is involved. jax 0.9.0, 2026-08-21.
"""

import os, sys, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS","") + " --xla_force_host_platform_device_count=4"
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
import tfhe_aes2_tpu
from tfhe_aes2_tpu.ops import keyswitch as ksm
from tfhe_aes2_tpu.ops import blind_rotate as br
from tfhe_aes2_tpu.ops import keys as keys_mod
from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64 as PR
from tfhe_aes2_tpu.parallel import mesh as mesh_mod

mesh = mesh_mod.make_mesh(4, lane_shards=4)
SH = NamedSharding(mesh, P("block","lane"))
n1 = PR.big_lwe_dimension + 1
rng = np.random.default_rng(1)
client, sks = keys_mod.generate_keys(PR, seed=3)
sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
bits = jnp.asarray(client.encrypt_bits(rng.integers(0,2,32)).reshape(1,4,8,n1))
d0 = jnp.asarray(np.asarray(jax.jit(lambda s, b: ksm.keyswitch(b, s.ksk, PR))(sks_dev, bits)))

def compare(name, f, arr):
    t0=time.time()
    un = np.asarray(jax.jit(f)(sks_dev, arr))
    sh = jax.jit(f, in_shardings=(None, SH), out_shardings=None)
    shv = np.asarray(sh(sks_dev, jax.device_put(arr, SH)))
    eq = np.array_equal(un, shv)
    print(f"[min4] {name}: equal={eq} ({time.time()-t0:.0f}s)", flush=True)
    return un, shv

un, shv = compare("pbs->pfks 32 lanes", lambda s, d: ksm.pfks_all(
    br.pbs_bit_to_level(d, s.bsk, PR.cbs_base_log, PR), s.pfpksk, PR), d0)
if not np.array_equal(un, shv):
    bad = np.nonzero((un != shv).reshape(32, -1).any(axis=-1))[0]
    print("bad flat-lanes:", bad.tolist())
    d = np.nonzero((un != shv).reshape(32, -1)[bad[0]])[0]
    print("lane", bad[0], "bad elements:", len(d), "of", un.size // 32)
