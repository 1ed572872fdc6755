"""Multi-host scale-out scaffolding (SURVEY.md §2.5).

The reference is single-process shared-memory rayon; the TPU-native
equivalent spans hosts: `jax.distributed.initialize` + a (host, chip) mesh
whose 'host' axis rides DCN and 'chip' axis rides ICI. CTR blocks shard over
both axes flattened (they are independent, main.rs:141-159); evaluation keys
replicate once per host.

Launch (one command per process; on a real pod slice omit the flags and let
jax.distributed discover the coordinator from the TPU environment):

    python -m tfhe_aes2_tpu.parallel.distributed \
        --coordinator <host:port> --num-processes N --process-id I \
        [--params test] [--rounds 1] [--blocks-per-device 1]

Every process runs the same program: deterministic keygen (same seed), global
block batch built with `host_local_array_to_global_array`, one jit over the
(host, chip) mesh, then each process decrypt-verifies its addressable output
shards against the plain oracle. tests/test_distributed.py drives this entry
point as a 2-process CPU job (4 virtual devices each) — the same code path a
real multi-host launch takes.
"""

from __future__ import annotations

import argparse
import sys


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize wrapper.

    With arguments: explicit coordinator rendezvous (multi-process CPU jobs,
    GPU clusters). Without: pod-environment auto-discovery (TPU slices)."""
    import jax

    if coordinator is None:
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_host_chip_mesh():
    """Mesh over (host, chip): axis 0 spans processes (DCN), axis 1 the
    process-local devices (ICI). jax.devices() orders by process index."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    devs = jax.devices()
    n_local = len(jax.local_devices())
    assert len(devs) % n_local == 0
    return Mesh(np.array(devs).reshape(len(devs) // n_local, n_local),
                ("host", "chip"))


def run_demo(params_name: str = "test", rounds: int = 1,
             blocks_per_device: int = 1, seed: int = 3,
             layout: str = "dp") -> None:
    """One sharded FHE AES step across all processes; every process verifies
    its local output shards. Raises on mismatch.

    layout:
      dp       — blocks shard over (host, chip) flattened (pure throughput DP).
      lane     — blocks shard over 'host' (DCN) and the 16-byte AES axis over
                 'chip' (ICI): each chip runs a fraction of every local
                 block's GGSW bootstraps — the composed throughput x latency
                 mapping (SURVEY §2.4; intra-block collectives stay on ICI).
      lanehost — the 16-byte AES axis shards over 'host' (blocks over the
                 local 'chip' axis): with N single-device processes this is
                 N-way INTRA-BLOCK sharding where every device belongs to a
                 different OS process / XLA runtime — the standing ≥4-way
                 production-geometry gate (multichip_gate.py), which the
                 in-process XLA:CPU multi-virtual-device runtime race
                 (probes/repro_xla_cpu_multidev.py) cannot touch.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    import tfhe_aes2_tpu  # noqa: F401 (x64)
    from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod, fhe_encryption, plain
    from tfhe_aes2_tpu.aes_128.scenario import ctr_blocks
    from tfhe_aes2_tpu.ops import keys as keys_mod
    from tfhe_aes2_tpu.ops import params as params_mod

    pset = {"test": params_mod.PARAMS_TEST,
            "test-n256": params_mod.PARAMS_TEST_N256,
            "lvl64": params_mod.PARAMS_SQRD_LVL_64}[params_name]
    mesh = make_host_chip_mesh()
    n_dev = len(jax.devices())
    n_local_dev = len(jax.local_devices())
    n_proc = jax.process_count()
    if layout == "lane":
        assert 16 % n_local_dev == 0, \
            f"lane layout needs the {n_local_dev} local chips to divide 16"
        n_blocks = n_proc * blocks_per_device
    elif layout == "lanehost":
        assert 16 % n_proc == 0, \
            f"lanehost layout needs the {n_proc} processes to divide 16"
        n_blocks = n_local_dev * blocks_per_device
    else:
        n_blocks = n_dev * blocks_per_device
    pid = jax.process_index()

    # deterministic client + server keys on every process (in a real
    # deployment the client ships serialized evaluation keys instead —
    # ops/serialization.py)
    client, sks = keys_mod.generate_keys(pset, seed=seed)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), pset)

    key = bytes(range(16))
    blocks = ctr_blocks(bytes(8), n_blocks)
    ks_ct = fhe_encryption.encrypt_word_array(client, plain.key_schedule(key))
    block_cts = np.asarray(fhe_encryption.encrypt_blocks(client, blocks))

    # global arrays: blocks sharded per the layout, rest replicated
    blocks_spec = {"lane": P("host", "chip"),
                   "lanehost": P("chip", "host"),
                   "dp": P(("host", "chip"))}[layout]
    if layout == "lanehost":
        bytes_per_proc = 16 // n_proc
        local = block_cts[:, pid * bytes_per_proc:(pid + 1) * bytes_per_proc]
    else:
        n_local_blocks = n_blocks // n_proc
        local = block_cts[pid * n_local_blocks: (pid + 1) * n_local_blocks]
    blocks_global = multihost_utils.host_local_array_to_global_array(
        local, mesh, blocks_spec)
    ks_global = multihost_utils.host_local_array_to_global_array(
        np.asarray(ks_ct), mesh, P())
    sks_global = jax.tree_util.tree_map(
        lambda a: multihost_utils.host_local_array_to_global_array(
            np.asarray(a), mesh, P()), sks_dev)

    from functools import partial
    fn = jax.jit(
        partial(fhe_mod._run_with_clear_schedule,
                fhe_mod.ShortintWoppbs1BitSboxGalMulPbsAesEncrypt, pset,
                rounds),
        in_shardings=(None, NamedSharding(mesh, P()),
                      NamedSharding(mesh, blocks_spec)),
        out_shardings=NamedSharding(mesh, blocks_spec))
    # compile explicitly, then meet at a COORDINATION-SERVICE barrier before
    # the first collective executes: XLA:CPU's gloo context rendezvous has a
    # hard 30s key-value timeout, while per-process compile of the
    # production program skews by MINUTES when N processes oversubscribe the
    # host's cores (observed at 8 procs on 4 cores: "Gloo context
    # initialization failed: GetKeyValue() timed out"). The coordination
    # barrier has no such limit, so all processes enter gloo together.
    compiled = fn.lower(sks_global, ks_global, blocks_global).compile()
    if jax.process_count() > 1:
        try:
            from jax._src import distributed as _jdist
            _jdist.global_state.client.wait_at_barrier(
                "tfhe_compiled", timeout_in_ms=3_600_000)
        except Exception as e:  # noqa: BLE001 — barrier is best-effort
            print(f"[distributed] compile barrier unavailable: {e}",
                  flush=True)
    out = compiled(sks_global, ks_global, blocks_global)
    out.block_until_ready()

    # verify the local shards only (no cross-host gather needed); lane/
    # lanehost shards cover a byte SLICE of each block, so compare at byte
    # granularity
    expect = plain.expand_key_and_encrypt_blocks(key, blocks, rounds)
    n_shards = 0
    for shard in out.addressable_shards:
        b0 = shard.index[0].start or 0
        c0 = shard.index[1].start or 0
        rows = np.asarray(shard.data)                    # [bs, byts, 8, n1]
        bits = client.decrypt_bits(rows)                 # [bs, byts, 8]
        got = np.packbits(bits.astype(np.uint8), axis=-1)[..., 0]
        for i in range(got.shape[0]):
            want = np.frombuffer(expect[b0 + i], np.uint8)[
                c0: c0 + got.shape[1]]
            assert (got[i] == want).all(), \
                f"process {pid} shard @({b0 + i},{c0}) mismatch"
        n_shards += 1
    print(f"ok: process {pid} verified {n_shards} local shards over "
          f"{n_proc} hosts x {len(jax.local_devices())} chips "
          f"(layout={layout}, params={params_name}, rounds={rounds})",
          flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="tfhe_aes2_tpu.parallel.distributed")
    ap.add_argument("--coordinator", type=str, default=None)
    ap.add_argument("--num-processes", type=int, default=None)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--params", type=str, default="test",
                    choices=["test", "test-n256", "lvl64"])
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--blocks-per-device", type=int, default=1)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--layout", type=str, default="dp",
                    choices=["dp", "lane", "lanehost"])
    args = ap.parse_args(argv)

    initialize(args.coordinator, args.num_processes, args.process_id)
    run_demo(args.params, args.rounds, args.blocks_per_device, args.seed,
             args.layout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
