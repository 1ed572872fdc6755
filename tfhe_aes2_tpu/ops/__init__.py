"""L0 — TPU-native TFHE primitive layer.

Re-implements, from scratch for TPU, the `tfhe-rs` 0.11 surface exercised by
the reference (SURVEY.md §2.3): LWE/GLWE/GGSW tensors over the 2^64 torus,
negacyclic polynomial arithmetic, gadget decomposition, external products /
CMux, blind rotation, sample extraction, LWE keyswitching, private functional
packing keyswitching, circuit bootstrapping, and vertical-packing CMux-tree
lookups.

Representation: torus elements are jnp.uint64 (q = 2^64). Every O(N^2)
contraction is lowered to exact int8 limb-plane matmuls accumulated in int32
(`exact_matmul`), which is the form the TPU MXU executes natively; u64
elementwise ops (XOR layer, decomposition bit-twiddling) run on the VPU.
"""
