"""Bit twiddling helpers, MSB-first everywhere.

Capability parity with reference src/util.rs:33-70 (u8/u16/u64 <-> bit arrays,
MSB-first order). Implemented on numpy for host-side (client) use.
"""

from __future__ import annotations

import numpy as np


def u8_to_bits(val: int) -> np.ndarray:
    """8 bits, MSB first (reference util.rs `u8_to_bits`)."""
    return np.unpackbits(np.array([val], dtype=np.uint8))


def u16_to_bits(val: int) -> np.ndarray:
    """16 bits, MSB first (reference util.rs `u16_to_bits`)."""
    return np.unpackbits(np.array([val], dtype=np.uint16).view(np.uint8)[::-1])


def u64_to_bits(val: int) -> np.ndarray:
    """64 bits, MSB first (reference util.rs `u64_to_bits`)."""
    return np.unpackbits(np.array([val], dtype=np.uint64).view(np.uint8)[::-1])


def bits_to_u8(bits) -> int:
    """MSB-first bits -> u8 (reference util.rs `bits_to_u8`)."""
    bits = np.asarray(bits, dtype=np.uint8)
    assert bits.shape == (8,)
    return int(np.packbits(bits)[0])


def bits_to_u64(bits) -> int:
    """MSB-first 64 bits -> u64 (reference util.rs `bits_to_u64`)."""
    bits = np.asarray(bits, dtype=np.uint8)
    assert bits.shape == (64,)
    return int(np.packbits(bits).view(">u8")[0])


def bytes_to_bits(data) -> np.ndarray:
    """Byte array -> flat bit array, each byte MSB first (fhe_encryption.rs:9-35 order)."""
    return np.unpackbits(np.asarray(bytearray(data), dtype=np.uint8))


def bits_to_bytes(bits) -> bytes:
    """Flat MSB-first bit array -> bytes."""
    bits = np.asarray(bits, dtype=np.uint8)
    assert bits.size % 8 == 0
    return np.packbits(bits).tobytes()
