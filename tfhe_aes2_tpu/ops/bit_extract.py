"""Multi-bit extraction from a wide LWE ciphertext (tfhe-rs `extract_bits`).

TPU-native equivalent of `WopbsKey::extract_bits` as used by the 8-bit model
(reference shortint_woppbs_8bit.rs:268-296, DeltaLog(56) x 8 bits): iterated
LSB peel — shift the target bit to 2^63, keyswitch to the small key, and for
all but the last bit remove its contribution with a scaling PBS before
continuing. Returns bits MSB-first (matching the reference's Byte order,
verified by its int->bits roundtrip test, shortint_woppbs_8bit.rs:464-478).

The single-bit case (delta_log=63, count=1) degenerates to one keyswitch —
exactly the 1-bit model's `extract_dual_bit_from_bit`.
"""

from __future__ import annotations

import jax.numpy as jnp

from tfhe_aes2_tpu.ops import blind_rotate as br
from tfhe_aes2_tpu.ops import keyswitch as ks
from tfhe_aes2_tpu.ops.keys import ServerKeySet
from tfhe_aes2_tpu.ops.params import WopbsParams
from tfhe_aes2_tpu.ops.torus import U64


def extract_bits(ct_big, sks: ServerKeySet, params: WopbsParams,
                 delta_log: int, count: int):
    """ct_big [..., kN+1] with message bits at [delta_log, delta_log+count)
    -> small-key bit cts [..., count, n+1], MSB first, each bit at 2^63."""
    assert delta_log + count <= 64
    ct = jnp.asarray(ct_big, U64)
    out = []
    for j in range(count):  # LSB first
        pos = delta_log + j
        shift = 63 - pos
        shifted = ct * jnp.uint64(1 << shift) if shift else ct
        small = ks.keyswitch(shifted, sks.ksk, params)
        out.append(small)
        if j < count - 1:
            contrib = br.pbs_bit_to_level(small, sks.bsk, 64 - pos, params)
            ct = ct - contrib
    out.reverse()  # MSB first
    return jnp.stack(out, axis=-2)
