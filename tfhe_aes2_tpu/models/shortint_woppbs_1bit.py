"""Model `shortint_woppbs_1bit` — 1-bit ciphertexts with WoP-PBS (production).

TPU-native re-design of reference src/tfhe/shortint_woppbs_1bit.rs:

  * `BitCt` here is a *tensor* of bit ciphertexts: an array [..., kN+1] whose
    trailing axis is one LWE ct per lane, plus per-lane noise metadata. The
    reference's one-heap-object-per-bit + rayon becomes struct-of-arrays +
    batched kernels.
  * XOR = wrapping LWE add (shortint_woppbs_1bit.rs:134-142) with
    variance-based noise tracking under the independence heuristic
    (README.md:46-63): `noise_level_squared` adds on XOR and is validated
    against `max_noise_level_squared`.
  * The noise-independence sanitizer (unique ciphertext ids + component-set
    disjointness assert, shortint_woppbs_1bit.rs:35-78) runs **at trace
    time**: the AES circuit is static, so the check costs nothing at runtime
    yet fails exactly where the reference would panic.
  * `circuit_bootstrap` = bit extract (keyswitch) -> per-level scaling PBS ->
    pfKS -> vertical-packing lookup, output noise = NOMINAL x input_bit_count
    (shortint_woppbs_1bit.rs:322-330, Lemma 3.2 of eprint 2017/430).
"""

from __future__ import annotations

import itertools
import os
from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs_ops
from tfhe_aes2_tpu.ops import keys as keys_mod
from tfhe_aes2_tpu.ops import lwe as lwe_ops
from tfhe_aes2_tpu.ops.params import (
    PARAMS_SQRD_LVL_1, PARAMS_SQRD_LVL_4, PARAMS_SQRD_LVL_64,
    PARAMS_SQRD_LVL_256, WopbsParams)
from tfhe_aes2_tpu.ops.torus import U64


class NoiseError(Exception):
    """Raised when noise accounting overflows (the reference's NoiseTooBig /
    'noise components not independent' panics)."""


_ID_COUNTER = itertools.count(1)


def _fresh_ids(shape) -> np.ndarray:
    """Array of singleton component sets with globally unique ids."""
    out = np.empty(shape, dtype=object)
    flat = out.reshape(-1)
    for i in range(flat.size):
        flat[i] = frozenset((next(_ID_COUNTER),))
    return out


def _empty_ids(shape) -> np.ndarray:
    out = np.empty(shape, dtype=object)
    out.reshape(-1)[:] = [frozenset()] * out.size
    return out


@dataclass
class FheContext:
    """Server-side evaluation context (reference FheContext,
    shortint_woppbs_1bit.rs:166-179).

    Outside a jit trace, `circuit_bootstrap` dispatches through a cache of
    per-shape compiled kernels (one XLA program per distinct (T, O, P) LUT
    geometry, reused for every round / key-schedule word) — keeping programs
    small enough to compile fast while the cheap XOR/gather glue runs eagerly.
    Inside a trace it inlines, so whole-step jits still work.
    """

    params: WopbsParams
    sks: keys_mod.ServerKeySet  # device arrays (or tracers inside jit)
    meta_only: bool = False     # shadow mode: circuit_bootstrap emits a stub
                                # array but REAL metadata (see meta_context)

    def __post_init__(self):
        self._cbs_kernel_cache = {}

    def trivial_bits(self, bits) -> "BitCt":
        """Trivial (noiseless) ciphertexts of `bits` (ContextT::trivial)."""
        arr = lwe_ops.trivial_bits(jnp.asarray(np.asarray(bits)),
                                   self.params.big_lwe_dimension)
        shape = np.asarray(bits).shape
        # degree = the literal bit (the reference's trivial path sets
        # Degree::new(value)); `bits` is always concrete here — np.asarray
        # above would reject a tracer before this line
        return BitCt(arr, np.zeros(shape, np.int64), _empty_ids(shape), self,
                     np.asarray(bits).astype(np.int64))

    def generate_lookup_table(self, input_bits: int, output_bits: int,
                              f: Callable[[int], int]) -> np.ndarray:
        """reference generate_lookup_table (shortint_woppbs_1bit.rs:274-289)."""
        return cbs_ops.generate_lut(input_bits, output_bits, f, self.params)

    def circuit_bootstrap(self, bits: "BitCt", lut: np.ndarray) -> "BitCt":
        """Multivariate multivalued bootstrap.

        bits: BitCt whose last lane axis is the T input bits, MSB first
              (array [..., T, kN+1]).
        lut:  [O, P, N] from generate_lookup_table.
        Returns BitCt [..., O lanes]: noise_level_squared = T (NOMINAL x
        input_bit_count, shortint_woppbs_1bit.rs:322-330), fresh components.
        """
        t = bits.array.shape[-2]
        o = lut.shape[0]
        if self.meta_only:
            # shadow evaluation: the metadata transform is what matters, the
            # array is a stub of the right shape (traced under eval_shape)
            out = jnp.zeros(bits.array.shape[:-2] + (o,) + bits.array.shape[-1:],
                            U64)
        elif isinstance(bits.array, jax.core.Tracer):
            out = cbs_ops.circuit_bootstrap_vertical_packing(
                bits.array, jnp.asarray(lut), self.sks, self.params)
        else:
            # TFHE_VP_NTT is read at trace time inside vertical_packing, so
            # it must be part of the jitted-program cache key — otherwise
            # toggling it mid-process would silently reuse a program traced
            # under the old setting (ADVICE r3).
            key = (bits.array.shape, lut.shape,
                   os.environ.get("TFHE_VP_NTT", "0"))
            if key not in self._cbs_kernel_cache:
                self._cbs_kernel_cache[key] = jax.jit(
                    lambda sks, b, l: cbs_ops.circuit_bootstrap_vertical_packing(
                        b, l, sks, self.params))
            out = self._cbs_kernel_cache[key](self.sks, bits.array,
                                              jnp.asarray(lut))
        lane_shape = bits.lane_shape[:-1] + (o,)
        return BitCt(out, np.full(lane_shape, t, np.int64),
                     _fresh_ids(lane_shape), self)

    def circuit_bootstrap_mixed(self, parts) -> list["BitCt"]:
        """Several bootstrap requests through ONE shared circuit-bootstrap
        front end (big->small keyswitch, scaling PBS, pfKS), split per
        request only for the cheap vertical-packing lookups.

        parts: list of (BitCt, lut) with DIFFERENT group sizes/LUTs — e.g.
        the key schedule's 128 identity 1-bit boots batched with the next
        group's 32 SubWord SBOX lanes (aes_128/sbox_gal_mul_pbs
        .key_schedule_fused_boot_sub). The blind rotation is ~95% of a cbs
        and is LUT-independent, so merging front ends nearly halves the key
        schedule's sequential scan count (VERDICT r4 #6). Inputs must be
        batchless (lane axes only); metadata rules per part match
        circuit_bootstrap (noise = T_i, fresh components,
        shortint_woppbs_1bit.rs:322-330).
        """
        n1 = self.params.big_lwe_dimension + 1
        flats, metas = [], []
        for bits, lut in parts:
            assert bits.array.ndim == len(bits.lane_shape) + 1, \
                "circuit_bootstrap_mixed takes batchless BitCts"
            t = bits.array.shape[-2]
            o = lut.shape[0]
            flats.append(bits.array.reshape((-1, n1)))
            metas.append((bits.lane_shape[:-1] + (o,), t))
        if self.meta_only:
            outs = [jnp.zeros(shape + (n1,), U64) for shape, _ in metas]
        else:
            ggsw = cbs_ops.circuit_bootstrap_bits(
                jnp.concatenate(flats, axis=0), self.sks, self.params)
            outs, off = [], 0
            for (bits, lut), flat in zip(parts, flats):
                t = bits.array.shape[-2]
                nl = flat.shape[0]
                g = ggsw[off:off + nl].reshape((nl // t, t) + ggsw.shape[1:])
                out = cbs_ops.vertical_packing(g, jnp.asarray(lut),
                                               self.params)
                outs.append(out.reshape(bits.array.shape[:-2]
                                        + (lut.shape[0], n1)))
                off += nl
        return [BitCt(out, np.full(shape, t, np.int64), _fresh_ids(shape),
                      self)
                for out, (shape, t) in zip(outs, metas)]


@dataclass
class BitCt:
    """Tensor of 1-bit LWE ciphertexts under the big (GLWE-as-LWE) key.

    array: [..., *lane_shape, kN+1] u64 (leading axes are batch).
    noise_sq / comps: per-lane metadata with shape lane_shape (batch lanes are
    statistically identical, so metadata is tracked once per lane, matching
    the reference's per-ciphertext tracking for each block independently).
    degree: per-lane message-degree bound, the reference's `Degree` field
    (wrap_in_shortint, shortint_woppbs_1bit.rs:405-417): the largest value
    the encoded message can take — 1 for any encrypted/bootstrapped bit, the
    literal bit for trivials, saturating-OR (min(a+b, 1)) under XOR since a
    XOR of bits stays a bit. Defaults to 1 so lane-manipulation call sites
    need not thread it; ops that know better (trivial_bits, XOR) set it.
    """

    array: jnp.ndarray
    noise_sq: np.ndarray      # int64 [lane_shape]
    comps: np.ndarray         # object [lane_shape] of frozenset
    context: FheContext
    degree: np.ndarray = None  # int64 [lane_shape]

    def __post_init__(self):
        if self.degree is None:
            self.degree = np.ones(self.noise_sq.shape, np.int64)

    @property
    def lane_shape(self):
        return self.noise_sq.shape

    # ---- XOR (reference BitXor, shortint_woppbs_1bit.rs:134-151) ----

    def __xor__(self, rhs: "BitCt") -> "BitCt":
        noise_sq = self.noise_sq + rhs.noise_sq
        max_sq = self.context.params.max_noise_level_squared
        if noise_sq.max(initial=0) > max_sq:
            raise NoiseError(
                f"NoiseTooBig: noise_level_squared {noise_sq.max()} exceeds "
                f"max {max_sq}")
        inter = np.frompyfunc(lambda a, b: a & b, 2, 1)(self.comps, rhs.comps)
        if any(len(s) > 0 for s in inter.reshape(-1)):
            raise NoiseError("noise components not independent")
        comps = np.frompyfunc(lambda a, b: a | b, 2, 1)(self.comps, rhs.comps)
        return BitCt(lwe_ops.add(self.array, rhs.array), noise_sq, comps,
                     self.context,
                     np.minimum(self.degree + rhs.degree, 1))

    # ---- lane manipulation (gathers carry metadata along) ----

    def take_lanes(self, idx, axis: int) -> "BitCt":
        """Gather lanes along lane axis `axis` (0 = outermost lane axis)."""
        idx = np.asarray(idx)
        n_lane = len(self.lane_shape)
        axis = axis % n_lane
        arr_axis = self.array.ndim - 1 - n_lane + axis
        return type(self)(jnp.take(self.array, jnp.asarray(idx), axis=arr_axis),
                          np.take(self.noise_sq, idx, axis=axis),
                          np.take(self.comps, idx, axis=axis), self.context,
                          np.take(self.degree, idx, axis=axis))

    def reshape_lanes(self, *lane_shape) -> "BitCt":
        batch = self.array.shape[: self.array.ndim - 1 - len(self.lane_shape)]
        arr = self.array.reshape(batch + tuple(lane_shape) + self.array.shape[-1:])
        return type(self)(arr, self.noise_sq.reshape(lane_shape),
                          self.comps.reshape(lane_shape), self.context,
                          self.degree.reshape(lane_shape))

    def slice_lanes(self, sl, axis: int = 0) -> "BitCt":
        """Slice one lane axis with python slice `sl`."""
        n_lane = len(self.lane_shape)
        axis = axis % n_lane
        arr_axis = self.array.ndim - 1 - n_lane + axis
        indexer = [slice(None)] * self.array.ndim
        indexer[arr_axis] = sl
        meta_idx = [slice(None)] * n_lane
        meta_idx[axis] = sl
        return type(self)(self.array[tuple(indexer)],
                          self.noise_sq[tuple(meta_idx)],
                          self.comps[tuple(meta_idx)], self.context,
                          self.degree[tuple(meta_idx)])

    @classmethod
    def concat_lanes(cls, parts: list["BitCt"], axis: int = 0) -> "BitCt":
        n_lane = len(parts[0].lane_shape)
        axis = axis % n_lane
        # broadcast leading batch axes so trivial (batchless) parts can join
        # batched states
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
        return cls(jnp.concatenate(arrays, axis=arr_axis),
                   np.concatenate([p.noise_sq for p in parts], axis=axis),
                   np.concatenate([p.comps for p in parts], axis=axis),
                   parts[0].context,
                   np.concatenate([p.degree for p in parts], axis=axis))


def meta_context(ctx: FheContext) -> FheContext:
    """Shadow context: same parameters, no keys; circuit_bootstrap emits stub
    arrays but real metadata. The staged execution path (aes_128/fhe.py) uses
    it to run the reference's always-on noise accounting — variance budget +
    component independence (shortint_woppbs_1bit.rs:63-78,134-142) — across
    compiled-program boundaries at trace cost."""
    return FheContext(params=ctx.params, sks=None, meta_only=True)


def fresh_bitct(arrays, context: FheContext, lane_ndim: int | None = None) -> BitCt:
    """Wrap freshly encrypted ct arrays ([..., kN+1]) as a BitCt with nominal
    noise (1) and fresh component ids. `lane_ndim` selects how many trailing
    axes (before the ct axis) are lanes; default: all."""
    arrays = jnp.asarray(arrays, U64)
    if lane_ndim is None:
        lane_ndim = arrays.ndim - 1
    lane_shape = arrays.shape[arrays.ndim - 1 - lane_ndim: -1]
    return BitCt(arrays, np.ones(lane_shape, np.int64), _fresh_ids(lane_shape),
                 context)


def generate_keys(params: WopbsParams = PARAMS_SQRD_LVL_64, seed: int = 0):
    """Generate (ClientKey, FheContext) — reference generate_keys_sqrd_lvl_*
    (shortint_woppbs_1bit.rs:229-268)."""
    client, sks = keys_mod.generate_keys(params, seed=seed)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), params)
    return client, FheContext(params=params, sks=sks_dev)


def generate_keys_sqrd_lvl_1(seed: int = 0):
    return generate_keys(PARAMS_SQRD_LVL_1, seed)


def generate_keys_sqrd_lvl_4(seed: int = 0):
    return generate_keys(PARAMS_SQRD_LVL_4, seed)


def generate_keys_sqrd_lvl_64(seed: int = 0):
    return generate_keys(PARAMS_SQRD_LVL_64, seed)


def generate_keys_sqrd_lvl_256(seed: int = 0):
    return generate_keys(PARAMS_SQRD_LVL_256, seed)
