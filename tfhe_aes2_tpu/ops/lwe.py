"""Server-side LWE tensor ops (jnp, u64).

LWE ciphertext layout: [..., dim+1] u64 = mask ‖ body. The XOR hot path of the
AES layer is `add` (reference `lwe_ciphertext_add_assign`,
shortint_woppbs_1bit.rs:136); trivial encryptions carry constants
(reference ContextT::trivial, src/tfhe.rs:19-24).
"""

from __future__ import annotations

import jax.numpy as jnp

from tfhe_aes2_tpu.ops.torus import U64, encode_bit


def trivial(encodings, dim: int):
    """encodings u64 [...] -> trivial LWE [..., dim+1] (zero mask)."""
    encodings = jnp.asarray(encodings, U64)
    mask = jnp.zeros(encodings.shape + (dim,), dtype=U64)
    return jnp.concatenate([mask, encodings[..., None]], axis=-1)


def trivial_bits(bits, dim: int):
    """bits [...] -> trivial LWE of bit<<63."""
    return trivial(encode_bit(bits), dim)


def add(a, b):
    """Wrapping LWE addition (the XOR of the 1-bit model)."""
    return jnp.asarray(a, U64) + jnp.asarray(b, U64)


def sub(a, b):
    return jnp.asarray(a, U64) - jnp.asarray(b, U64)


def add_body(ct, delta):
    """ct + trivial(delta): add a constant to the body only."""
    ct = jnp.asarray(ct, U64)
    return ct.at[..., -1].add(jnp.asarray(delta, U64))
