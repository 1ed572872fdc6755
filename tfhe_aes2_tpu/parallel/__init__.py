"""Scale-out layer: device meshes + sharded CTR batch / PBS-lane execution.

The reference's only parallel substrate is rayon shared memory (SURVEY.md
§2.4). The TPU-native mapping: CTR blocks (embarrassingly parallel,
main.rs:141-159) shard over the mesh 'block' axis; within a block the
16 bytes x 8 bits of concurrent GGSW circuit-bootstraps (the reference's
stated headroom, README.md:70-71) shard over the 'lane' axis; evaluation keys
are replicated so the blind-rotate CMux chain needs no collectives on the hot
path.
"""

from tfhe_aes2_tpu.parallel.mesh import (
    make_mesh, make_sharded_encrypt_blocks_fn, make_sharded_full_aes_fn)
