"""Mesh construction + sharded AES entry points (jax.sharding / pjit).

Sharding layout:
  * blocks  [B, 16, 8, n1] — sharded on the batch axis over mesh axis 'block'
    (the CTR blocks are independent; DCN/ICI never sees the hot loop).
  * expanded key / server keys — replicated (broadcast once; every chip runs
    its blocks' bootstraps locally against its key copy).
The per-chip computation is identical to the single-chip path; XLA partitions
the batched blind-rotate matmuls along the sharded batch dimension.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tfhe_aes2_tpu.aes_128 import fhe as fhe_mod


def make_mesh(n_devices: int | None = None, axis_name: str = "block") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def _sharded(fn, mesh: Mesh, key_lane_ndim: int):
    repl = NamedSharding(mesh, P())
    block_sharded = NamedSharding(mesh, P("block"))
    return jax.jit(
        fn,
        in_shardings=(None, repl, block_sharded),
        out_shardings=block_sharded,
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
