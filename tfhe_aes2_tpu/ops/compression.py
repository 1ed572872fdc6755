"""Output ciphertext compression for transport (server -> client).

The reference returns big-key LWE bits in-process, where transfer is free
(main.rs:123). In a deployed client/server split the response size matters:
a big-key AES block is 16·8 LWE cts of kN+1 = 2049 u64 words ≈ 2.1 MB. This
module compresses server outputs before transport:

  1. big -> small keyswitch (the framework's existing KS, kN+1 -> n+1);
  2. modulus switch q = 2^64 -> q' = 2^log2q (u32 or u16 words).

Noise budget: the end-to-end output error is ~2^58.25 (PERF.md "Production
noise margin", 13.4σ); the keyswitch adds sigma_lwe ≈ 2^49.6 and the modulus
switch adds a key-amplified rounding term of std sqrt((1 + n/2)/12) ≈ 5.3
words at q' — scaled to the q'-domain threshold q'/4 the margins are
essentially unchanged (log2q=16 still leaves the rounding term ~2^11 below
threshold). Per-block sizes at production: 2.1 MB (raw big-key) ->
0.35 MB (log2q=32, 6x) -> 0.17 MB (log2q=16, 12.3x).

Client-side decode: `decrypt_bits_compressed`. Server side is jittable and
batched like every other op.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.ops import keyswitch as ksw
from tfhe_aes2_tpu.ops.params import WopbsParams
from tfhe_aes2_tpu.ops.torus import U64


def mod_switch_q(x, log2q: int):
    """u64 torus -> Z_{2^log2q}: round(x · q'/2^64), in the narrowest word
    (uint16 when log2q <= 16, else uint32) so transport off the device
    already rides the wire width."""
    x = jnp.asarray(x, U64)
    shift = 64 - log2q
    r = (x + (jnp.uint64(1) << jnp.uint64(shift - 1))) >> jnp.uint64(shift)
    mask = jnp.uint64((1 << log2q) - 1)
    dt = jnp.uint16 if log2q <= 16 else jnp.uint32
    return (r & mask).astype(dt)


def compress_bits(cts_big, sks, params: WopbsParams, log2q: int = 32):
    """Big-key LWE bits [..., kN+1] -> compressed small-key cts
    [..., n+1] with coefficients in Z_{2^log2q} (log2q <= 32; uint16 words
    when log2q <= 16)."""
    assert 8 <= log2q <= 32
    small = ksw.keyswitch(jnp.asarray(cts_big, U64), sks.ksk, params)
    return mod_switch_q(small, log2q)


def pack_bytes(comp, log2q: int) -> bytes:
    """Serialize a compressed tensor to little-endian log2q-bit words."""
    arr = np.asarray(comp)
    if log2q <= 16:
        return arr.astype("<u2").tobytes()
    return arr.astype("<u4").tobytes()


def unpack_bytes(data: bytes, shape, log2q: int) -> np.ndarray:
    dt = "<u2" if log2q <= 16 else "<u4"
    return np.frombuffer(data, dtype=dt).reshape(shape).astype(np.uint32)


def decrypt_bits_compressed(client, comp, log2q: int = 32) -> np.ndarray:
    """Compressed cts uint32 [..., n+1] -> bits [...] (threshold decode in
    Z_{2^log2q}: bit encoded at q'/2, threshold q'/4)."""
    comp = np.asarray(comp, dtype=np.uint64)
    mask_q = np.uint64((1 << log2q) - 1)
    a, b = comp[..., :-1], comp[..., -1]
    phase = (b - (a * client.lwe_sk.astype(np.uint64)).sum(axis=-1)) & mask_q
    return ((phase + np.uint64(1 << (log2q - 2)))
            >> np.uint64(log2q - 1)) & np.uint64(1)


def decrypt_blocks_compressed(client, comp, log2q: int = 32) -> list[bytes]:
    """Compressed blocks [B, 16, 8, n+1] -> list of 16-byte plaintexts."""
    bits = decrypt_bits_compressed(client, comp, log2q)
    return [np.packbits(row.astype(np.uint8), axis=-1)[..., 0].tobytes()
            for row in bits]
