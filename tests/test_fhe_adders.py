"""Homomorphic CTR-increment adders (mirror shortint_woppbs_1bit.rs:792-877):
how a server-side FHE counter would work if the counter itself stayed
encrypted — ripple-carry via 2->2 LUTs and bytewise via 9->9 LUTs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tfhe_aes2_tpu.models import shortint_woppbs_1bit as model
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import BitCt, FheContext


@pytest.fixture(scope="module")
def ctx_client(keys_test_n256):
    client, sks = keys_test_n256
    sks_dev = jax.tree_util.tree_map(jnp.asarray, sks)
    return client, FheContext(params=client.params, sks=sks_dev)


def _encrypt_block_bits(client, ctx, data: bytes) -> BitCt:
    bits = np.unpackbits(np.frombuffer(data, np.uint8)).reshape(16, 8)
    return model.fresh_bitct(jnp.asarray(client.encrypt_bits(bits)), ctx)


def _decrypt_block(client, ct: BitCt) -> bytes:
    bits = client.decrypt_bits(np.asarray(ct.array)).astype(np.uint8)
    return np.packbits(bits).tobytes()


def test_increment_1bit_adder(ctx_client):
    """Ripple-carry increment: per bit (LSB->MSB) a 2-in/2-out LUT computing
    carry+bit (shortint_woppbs_1bit.rs:792-831)."""
    client, ctx = ctx_client
    value = _encrypt_block_bits(client, ctx, bytes(16))

    # add_fn: val bits [carry, bit] -> (carry+bit) as 2-bit [new_carry, sum]
    lut = ctx.generate_lookup_table(2, 2, lambda v: (v >> 1) + (v & 1))

    def increment(block: BitCt) -> BitCt:
        carry = ctx.trivial_bits(np.array([1]))
        out_lanes = []
        for i in range(127, -1, -1):  # LSB (lane 127) upward
            bit = block.slice_lanes(slice(i, i + 1), axis=0)
            pair = BitCt.concat_lanes([carry, bit], axis=0)
            out = ctx.circuit_bootstrap(pair, lut)
            carry = out.slice_lanes(slice(0, 1), axis=0)
            out_lanes.append(out.slice_lanes(slice(1, 2), axis=0))
        out_lanes.reverse()
        return BitCt.concat_lanes(out_lanes, axis=0)

    v = increment(value.reshape_lanes(128))
    v = increment(v)
    got = _decrypt_block(client, v)
    assert got == bytes(15) + bytes([2])


def test_increment_8bit_adder(ctx_client):
    """Bytewise increment via 9-in/9-out LUTs (shortint_woppbs_1bit.rs:833-877)."""
    client, ctx = ctx_client
    start = bytes(14) + bytes([0, 255])
    value = _encrypt_block_bits(client, ctx, start)

    # val = [carry, b7..b0]: out 9 bits [new_carry, sum byte]
    lut = ctx.generate_lookup_table(9, 9, lambda v: (v & 0xFF) + (v >> 8))

    def increment(block: BitCt) -> BitCt:
        carry = ctx.trivial_bits(np.array([1]))
        out_bytes = []
        for i in range(15, -1, -1):
            byte = block.slice_lanes(slice(i, i + 1), axis=0).reshape_lanes(8)
            nine = BitCt.concat_lanes([carry, byte], axis=0)
            out = ctx.circuit_bootstrap(nine, lut)
            carry = out.slice_lanes(slice(0, 1), axis=0)
            out_bytes.append(out.slice_lanes(slice(1, 9), axis=0).reshape_lanes(1, 8))
        out_bytes.reverse()
        return BitCt.concat_lanes(out_bytes, axis=0)

    v = increment(value)
    v = increment(v)
    v = increment(v)
    got = _decrypt_block(client, v)
    assert got == bytes(14) + bytes([1, 2])
