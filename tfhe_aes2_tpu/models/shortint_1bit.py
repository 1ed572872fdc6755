"""Model `shortint_1bit` — plain-PBS 1-bit ciphertexts with tree-based
multivariate bootstrapping (TCHES 8793).

TPU-native re-design of reference src/tfhe/shortint_1bit.rs: bits encode at
2^62 under the *small* LWE key (shortint message 2 / carry 1); XOR is an
unchecked add whose carry overflows into the padding bit (valid because every
functional bootstrap is effectively negacyclic, shortint_1bit.rs:103-115).
The multivariate bootstrap evaluates an n-bit function as a binary tree:
leaf test vectors select on the LSB, each level bootstraps the remaining test
vectors by one selector bit and packs result pairs into new (encrypted) test
vectors via the LWE->GLWE packing keyswitch (shortint_1bit.rs:392-576).

The reference flags its parameter set `!Testing parameters!`
(shortint_1bit.rs:62) and #[ignore]s its AES tests for noise accumulation;
this port provides the same capability surface.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.ops import blind_rotate as br
from tfhe_aes2_tpu.ops import keys as keys_mod
from tfhe_aes2_tpu.ops import keyswitch as ksw
from tfhe_aes2_tpu.ops import packing_keyswitch as pks
from tfhe_aes2_tpu.ops import polynomial
from tfhe_aes2_tpu.ops.params import WopbsParams
from tfhe_aes2_tpu.ops.torus import U64

# reference shortint_1bit.rs:63-83 — flagged `todo !Testing parameters!`
PARAMS_SHORTINT_1BIT = WopbsParams(
    lwe_dimension=640,
    glwe_dimension=4,
    polynomial_size=512,
    lwe_noise_std=4.728000245054929e-7,
    glwe_noise_std=2.845267479601915e-15,
    pbs_level=7, pbs_base_log=6,
    ks_level=2, ks_base_log=6,
    cbs_level=1, cbs_base_log=10,       # unused by this model
    pfks_level=1, pfks_base_log=24,     # unused by this model
    pfks_noise_std=2.845267479601915e-15,
    max_noise_level_squared=0,
    max_noise_level_linear=11,
)

# small insecure set for CPU tests
PARAMS_TEST_S1 = WopbsParams(
    lwe_dimension=32,
    glwe_dimension=1,
    polynomial_size=128,
    lwe_noise_std=2.0 ** -35,
    glwe_noise_std=2.0 ** -45,
    pbs_level=3, pbs_base_log=12,
    ks_level=3, ks_base_log=6,
    cbs_level=1, cbs_base_log=10,
    pfks_level=1, pfks_base_log=24,
    pfks_noise_std=2.0 ** -45,
    max_noise_level_squared=0,
    max_noise_level_linear=11,
)


def encode_bit(bit):
    """bit at 2^62 (shortint_1bit.rs:352-356)."""
    return jnp.asarray(bit, U64) << jnp.uint64(62)


@dataclass
class FheContext:
    """shortint_1bit server context (shortint_1bit.rs:132-144)."""

    params: WopbsParams
    sks: keys_mod.ServerKeySet

    def __post_init__(self):
        self._kernel_cache = {}

    def trivial(self, bits) -> "Bit1Ct":
        bits = np.asarray(bits)
        mask = np.zeros(bits.shape + (self.params.lwe_dimension,), np.uint64)
        body = (bits.astype(np.uint64) << np.uint64(62))[..., None]
        return Bit1Ct(jnp.asarray(np.concatenate([mask, body], axis=-1)), self)

    def trivial_bits(self, bits) -> "LaneBit1Ct":
        """Lane-tensor trivial ciphertexts (the AES data-model entry point,
        ContextT::trivial equivalent for this model)."""
        bits = np.asarray(bits)
        return LaneBit1Ct(self.trivial(bits).array, bits.shape, self)

    # -- test vectors --

    def test_vector_from_cleartext_fn(self, f) -> jnp.ndarray:
        """Clear GLWE accumulator for f: {0,1}->{0,1}
        (shortint_1bit.rs:365-390). Returns [k+1, N] u64 (trivial)."""
        p = self.params
        n = p.polynomial_size
        box = n // 2
        body = np.empty(n, np.uint64)
        body[:box] = np.uint64(int(f(0)) << 62)
        body[box:] = np.uint64(int(f(1)) << 62)
        body = np.roll(body, -(box // 2))
        glwe = np.zeros((p.glwe_dimension + 1, n), np.uint64)
        glwe[-1] = body
        return jnp.asarray(glwe)

    def test_vector_from_ciphertexts(self, ct0: "Bit1Ct", ct1: "Bit1Ct"):
        """Encrypted accumulator selecting ct0/ct1 with the box layout of
        test_vector_from_cleartext_fn (shortint_1bit.rs:392-492)."""
        return _tv_from_ct_arrays(ct0.array, ct1.array, self.sks.pksk, self.params)

    def packing_keyswitch(self, cts: "Bit1Ct"):
        """Pack bit cts [..., M, n+1] at successive monomials
        (shortint_1bit.rs:239-254)."""
        return pks.pack_lwe_list(cts.array, self.sks.pksk, self.params)

    # -- bootstrap --

    def bootstrap(self, ct: "Bit1Ct", test_vector) -> "Bit1Ct":
        """Blind rotate + sample extract + keyswitch (shortint_1bit.rs:264-289).

        test_vector: [,,, k+1, N] (clear or encrypted GLWE accumulator),
        broadcastable against the ct batch."""
        p = self.params
        acc = br.blind_rotate_glwe(ct.array, self.sks.bsk, test_vector, p)
        big = br.sample_extract0(acc)
        return Bit1Ct(ksw.keyswitch(big, self.sks.ksk, p), self)


def _tv_from_ct_arrays(ct0, ct1, pksk, params):
    p = params
    n = p.polynomial_size
    hb = n // 4
    p0 = pks.pack_lwe(ct0, pksk, p)[..., None, :, :]   # [..., 1(R), k+1, N]
    p1 = pks.pack_lwe(ct1, pksk, p)[..., None, :, :]
    mask0 = np.zeros(n, np.int32)
    mask0[:hb] = 1
    mask0[n - hb:] = 1
    mask1 = np.zeros(n, np.int32)
    mask1[hb: n - hb] = 1
    batch = p0.shape[:-3]
    d0 = jnp.broadcast_to(jnp.asarray(mask0), batch + (1, n))
    d1 = jnp.broadcast_to(jnp.asarray(mask1), batch + (1, n))
    return (polynomial.polymul_digits_grouped(d0, p0, 1)
            + polynomial.polymul_digits_grouped(d1, p1, 1))


@dataclass
class Bit1Ct:
    """1-bit shortint ciphertext tensor under the small key, bit at 2^62."""

    array: jnp.ndarray  # [..., n+1]
    context: FheContext

    def __xor__(self, rhs: "Bit1Ct") -> "Bit1Ct":
        # unchecked add; carry overflows into the padding bit
        # (shortint_1bit.rs:103-115)
        return Bit1Ct(self.array + rhs.array, self.context)


@dataclass
class LaneBit1Ct:
    """Lane-tensor of shortint_1bit ciphertexts — the AES data-model bit type
    for this model (array [..., *lane_shape, n+1], bit at 2^62 under the
    small key). XOR is the unchecked add whose carry overflows into the
    padding bit (shortint_1bit.rs:103-115); the model tracks no noise
    metadata, matching the reference (whose AES tests are #[ignore]d for
    exactly that uncontrolled accumulation, fhe_impls/shortint_1bit.rs:81-83).
    """

    array: jnp.ndarray
    lane_shape: tuple
    context: FheContext

    def __xor__(self, rhs: "LaneBit1Ct") -> "LaneBit1Ct":
        return LaneBit1Ct(jnp.asarray(self.array, U64)
                          + jnp.asarray(rhs.array, U64),
                          self.lane_shape, self.context)

    def _arr_axis(self, axis: int):
        n_lane = len(self.lane_shape)
        axis = axis % n_lane
        return self.array.ndim - 1 - n_lane + axis, axis

    def take_lanes(self, idx, axis: int) -> "LaneBit1Ct":
        arr_axis, axis = self._arr_axis(axis)
        idx = np.asarray(idx)
        shape = self.lane_shape[:axis] + idx.shape + self.lane_shape[axis + 1:]
        return LaneBit1Ct(jnp.take(self.array, jnp.asarray(idx), axis=arr_axis),
                          shape, self.context)

    def slice_lanes(self, sl, axis: int = 0) -> "LaneBit1Ct":
        arr_axis, axis = self._arr_axis(axis)
        indexer = [slice(None)] * self.array.ndim
        indexer[arr_axis] = sl
        arr = self.array[tuple(indexer)]
        n_lane = len(self.lane_shape)
        return LaneBit1Ct(arr, tuple(arr.shape[arr.ndim - 1 - n_lane: -1]),
                          self.context)

    def reshape_lanes(self, *lane_shape) -> "LaneBit1Ct":
        batch = self.array.shape[: self.array.ndim - 1 - len(self.lane_shape)]
        arr = self.array.reshape(batch + tuple(lane_shape)
                                 + self.array.shape[-1:])
        return LaneBit1Ct(arr, tuple(lane_shape), self.context)

    @classmethod
    def concat_lanes(cls, parts, axis: int = 0) -> "LaneBit1Ct":
        n_lane = len(parts[0].lane_shape)
        axis = axis % n_lane
        max_ndim = max(p.array.ndim for p in parts)
        arrays = []
        for p in parts:
            a = p.array
            if a.ndim < max_ndim:
                batch = next(q.array.shape[: max_ndim - a.ndim]
                             for q in parts if q.array.ndim == max_ndim)
                a = jnp.broadcast_to(a, batch + a.shape)
            arrays.append(a)
        arr_axis = max_ndim - 1 - n_lane + axis
        shape = list(parts[0].lane_shape)
        shape[axis] = sum(p.lane_shape[axis] for p in parts)
        return cls(jnp.concatenate(arrays, axis=arr_axis), tuple(shape),
                   parts[0].context)


def fresh_lane_bit1ct(arrays, context: FheContext,
                      lane_ndim: int | None = None) -> LaneBit1Ct:
    arrays = jnp.asarray(arrays, U64)
    if lane_ndim is None:
        lane_ndim = arrays.ndim - 1
    shape = tuple(arrays.shape[arrays.ndim - 1 - lane_ndim: -1])
    return LaneBit1Ct(arrays, shape, context)


class Shortint1BitByteOps:
    """Byte ops for AES pipeline A on this model: SBOX as 8 per-output-bit
    multivariate tree bootstraps, identity-bootstrap noise reset
    (fhe_impls/shortint_1bit.rs:30-47). All 16 bytes × 8 output bits × tree
    test vectors advance through each blind rotation as one batch."""

    def __init__(self, ctx: FheContext):
        self.ctx = ctx

    def _sbox_tvs(self):
        cache = self.ctx._kernel_cache
        if "sbox_tvs" not in cache:
            from tfhe_aes2_tpu.aes_128 import SBOX
            tvs = [generate_multivariate_test_vector(
                self.ctx, 8, lambda v, o=o: (int(SBOX[v]) >> (7 - o)) & 1)
                for o in range(8)]
            cache["sbox_tvs"] = jnp.stack(tvs, axis=0)   # [8, 128, k+1, N]
        return cache["sbox_tvs"]

    def sub_bytes(self, state: LaneBit1Ct) -> LaneBit1Ct:
        arr = jnp.asarray(state.array, U64)             # [..., 8(bit), n+1]
        bit_arr = jnp.broadcast_to(
            arr[..., None, :, :], arr.shape[:-2] + (8, 8, arr.shape[-1]))
        out = _tree_pbs_batched(self.ctx, bit_arr, self._sbox_tvs())
        return type(state)(out, state.lane_shape, self.ctx)

    def boot(self, word: LaneBit1Ct) -> LaneBit1Ct:
        tv = self.ctx.test_vector_from_cleartext_fn(lambda b: b)
        out = self.ctx.bootstrap(Bit1Ct(word.array, self.ctx), tv)
        return type(word)(out.array, word.lane_shape, self.ctx)


def generate_multivariate_test_vector(ctx: FheContext, bits: int, f):
    """Leaf test vectors, one per even input value, selecting on the LSB
    (shortint_1bit.rs:520-536). Returns [2^(bits-1), k+1, N] u64 (clear)."""
    assert 0 < bits <= 8
    tvs = [ctx.test_vector_from_cleartext_fn(
        lambda b, v=val: f(v + int(b))) for val in range(0, 1 << bits, 2)]
    return jnp.stack(tvs, axis=0)


def _tree_pbs_batched(ctx: FheContext, bit_arr, test_vectors) -> jnp.ndarray:
    """Batched tree-based multivariate bootstrap core.

    bit_arr: u64 [..., T, n+1], MSB first (the LSB selects at the leaves).
    test_vectors: [..., 2^(T-1), k+1, N], broadcastable against the [...]
    batch (per-batch-lane leaf tables, e.g. one per SBOX output bit).
    Returns u64 [..., n+1]. Every tree level bootstraps ALL remaining test
    vectors of ALL batch lanes through one blind rotation.
    """
    t = bit_arr.shape[-2]
    batch = bit_arr.shape[:-2]
    tvs = jnp.asarray(test_vectors, U64)
    tvs = jnp.broadcast_to(tvs, batch + tvs.shape[-3:])
    for level in range(t - 1, 0, -1):
        n_tv = tvs.shape[-3]
        sel = jnp.broadcast_to(bit_arr[..., level, None, :],
                               batch + (n_tv, bit_arr.shape[-1]))
        outs = ctx.bootstrap(Bit1Ct(sel, ctx), tvs)     # [..., n_tv, n+1]
        tvs = _tv_from_ct_arrays(outs.array[..., 0::2, :],
                                 outs.array[..., 1::2, :],
                                 ctx.sks.pksk, ctx.params)
    return ctx.bootstrap(Bit1Ct(bit_arr[..., 0, :], ctx),
                         tvs[..., 0, :, :]).array


def calculate_multivariate_function(ctx: FheContext, bit_cts: "Bit1Ct",
                                    test_vectors) -> "Bit1Ct":
    """Tree-based multivariate bootstrap (shortint_1bit.rs:539-576).

    bit_cts: Bit1Ct [T, n+1], MSB first (the LSB selects at the leaves).
    test_vectors: [2^(T-1), k+1, N].
    """
    return Bit1Ct(_tree_pbs_batched(ctx, bit_cts.array, test_vectors), ctx)


def generate_keys(params: WopbsParams = PARAMS_SHORTINT_1BIT, seed: int = 0):
    client, sks = keys_mod.generate_keys(params, seed=seed)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), params)
    return client, FheContext(params=params, sks=sks_dev)
