"""Mesh construction + sharded AES entry points (jax.sharding / pjit).

Two sharding layouts over a ('block', 'lane') mesh:

  * batch DP (throughput): blocks [B, 16, 8, n1] sharded on the batch axis
    over 'block' — the CTR blocks are independent (main.rs:141-159), so the
    hot loop needs no collectives at all.
  * intra-block (latency): the 16-byte axis additionally sharded over 'lane'
    — the per-round 16 SBOX circuit bootstraps (= 128 GGSW bootstraps, the
    reference's stated serial headroom, README.md:70-71) split across chips.
    The heavy stages (keyswitch, blind-rotate CMux scan, pfKS, vertical
    packing) are lane-local, so each chip runs 1/shards of the MXU work; the
    cheap linear stages (ShiftRows/MixColumns lane shuffles, XORs) cross the
    lane axis and XLA inserts the collectives there, off the hot path.

Evaluation keys are replicated either way (broadcast once; every chip runs
its lanes' bootstraps against its local copy).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod


def make_mesh(n_devices: int | None = None, axis_name: str = "block",
              lane_shards: int = 1) -> Mesh:
    """1-D 'block' mesh, or ('block', 'lane') when lane_shards > 1.

    lane_shards must divide both the device count and 16 (the AES byte axis
    it shards)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if lane_shards == 1:
        return Mesh(np.array(devices), (axis_name,))
    assert len(devices) % lane_shards == 0 and 16 % lane_shards == 0, \
        f"lane_shards {lane_shards} must divide {len(devices)} devices and 16"
    arr = np.array(devices).reshape(len(devices) // lane_shards, lane_shards)
    return Mesh(arr, (axis_name, "lane"))


def block_spec(mesh: Mesh) -> P:
    """PartitionSpec for a blocks tensor [B, 16, 8, n1] on this mesh."""
    if "lane" in mesh.axis_names:
        return P("block", "lane")
    return P("block")


def _sharded(fn, mesh: Mesh, key_lane_ndim: int):
    repl = NamedSharding(mesh, P())
    blocks = NamedSharding(mesh, block_spec(mesh))
    return jax.jit(
        fn,
        in_shardings=(None, repl, blocks),
        out_shardings=blocks,
    )


def make_sharded_encrypt_blocks_fn(strategy, params, rounds: int, mesh: Mesh):
    """(sks, ks_cts [44,4,8,n1] repl, blocks [B,16,8,n1] block-sharded)."""
    from functools import partial
    from tfhe_aes2_tpu.aes_128.fhe import _run_with_clear_schedule
    fn = partial(_run_with_clear_schedule, strategy, params, rounds)
    return _sharded(fn, mesh, 3)


def make_sharded_full_aes_fn(strategy, params, rounds: int, mesh: Mesh):
    """(sks, key_cts [16,8,n1] repl, blocks [B,16,8,n1] block-sharded) —
    FHE key schedule (replicated) + all rounds (sharded) in one program."""
    from functools import partial
    from tfhe_aes2_tpu.aes_128.fhe import _run_full
    fn = partial(_run_full, strategy, params, rounds)
    return _sharded(fn, mesh, 2)
