"""Model `shortint_woppbs_8bit` — 8-bit ciphertexts with WoP-PBS.

TPU-native re-design of reference src/tfhe/shortint_woppbs_8bit.rs: the SBOX
is evaluated on a single 8-bit `FullWidthCt` (message modulus 256 at
delta 2^56) via one WoP-PBS, then the 8 one-bit "dual" ciphertexts (under the
*small* LWE key) are re-extracted for the XOR layer. Noise tracking is the
linear shortint `NoiseLevel` (stddev-additive, max 11 —
shortint_woppbs_8bit.rs:79,154-160); no independence sets.

Kept for capability parity; dominated by shortint_woppbs_1bit (README.md:77).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tfhe_aes2_tpu.ops import bit_extract as be
from tfhe_aes2_tpu.ops import circuit_bootstrap as cbs_ops
from tfhe_aes2_tpu.ops import keys as keys_mod
from tfhe_aes2_tpu.ops import lwe as lwe_ops
from tfhe_aes2_tpu.ops.params import PARAMS_WOPPBS_8BIT, WopbsParams
from tfhe_aes2_tpu.models.shortint_woppbs_1bit import BitCt, NoiseError, _empty_ids


@dataclass
class FheContext:
    """8-bit model server context (shortint_woppbs_8bit.rs:184-196)."""

    params: WopbsParams
    sks: keys_mod.ServerKeySet

    def __post_init__(self):
        self._kernel_cache = {}

    # -- bit tensors live under the SMALL key in this model --

    def trivial_bits(self, bits) -> "LinearBitCt":
        arr = lwe_ops.trivial_bits(jnp.asarray(np.asarray(bits)),
                                   self.params.lwe_dimension)
        shape = np.asarray(bits).shape
        return LinearBitCt(arr, np.zeros(shape, np.int64), _empty_ids(shape), self)

    def generate_lookup_table(self, f) -> np.ndarray:
        """Full-width LUT (generate_lut_without_padding,
        shortint_woppbs_8bit.rs:262-265): entries f(v)·2^(64-8) at index v.
        Returns [1, P, N]."""
        p = self.params
        n, logn = p.polynomial_size, p.log2_poly_size
        bits = p.message_bits
        tree_bits = max(0, bits - logn)
        lut = np.zeros((1, (1 << tree_bits) * n), dtype=np.uint64)
        vals = np.array([int(f(v)) % (1 << bits) for v in range(1 << bits)],
                        dtype=np.uint64)
        lut[0, : 1 << bits] = vals << np.uint64(64 - bits)
        return lut.reshape(1, 1 << tree_bits, n)

    def _jit(self, name, fn):
        if name not in self._kernel_cache:
            self._kernel_cache[name] = jax.jit(fn)
        return self._kernel_cache[name]

    def bootstrap_from_bits(self, byte: "LinearBitCt", lut: np.ndarray):
        """8 dual bits [..., 8, n+1] (MSB first) -> FullWidthCt [..., kN+1]
        encoding f(byte)·2^56 (shortint_woppbs_8bit.rs:299-335)."""
        p = self.params
        run = self._jit(("bfb", byte.array.shape, lut.shape),
                        lambda sks, b, l: cbs_ops.vertical_packing(
                            cbs_ops.circuit_bootstrap_bits_small(b, sks, p),
                            l, p))
        out = run(self.sks, byte.array, jnp.asarray(lut))
        return FullWidthCt(out[..., 0, :], self)

    def extract_bits_from_ciphertext(self, fw: "FullWidthCt") -> "LinearBitCt":
        """FullWidthCt -> 8 dual bit cts [..., 8 lanes], fresh NOMINAL noise
        (shortint_woppbs_8bit.rs:268-296)."""
        p = self.params
        run = self._jit(("extract", fw.array.shape),
                        lambda sks, c: be.extract_bits(
                            c, sks, p, 64 - p.message_bits, p.message_bits))
        out = run(self.sks, fw.array)
        lanes = _lanes(out)
        return LinearBitCt(out, np.ones(lanes, np.int64), _empty_ids(lanes), self)


def _lanes(arr):
    """All axes except the trailing ciphertext axis are lanes for metadata."""
    return arr.shape[:-1]


class LinearBitCt(BitCt):
    """1-bit dual ciphertext tensor under the small key with linear
    (stddev-additive) noise tracking — the shortint NoiseLevel semantics
    (shortint_woppbs_8bit.rs:154-160). Component sets are unused (always
    empty), matching the reference's lack of an independence check here."""

    def __xor__(self, rhs: "LinearBitCt") -> "LinearBitCt":
        noise = self.noise_sq + rhs.noise_sq  # linear NoiseLevel sum
        max_lin = self.context.params.max_noise_level_linear
        if noise.max(initial=0) > max_lin:
            raise NoiseError(
                f"NoiseTooBig: noise_level {noise.max()} exceeds max {max_lin}")
        return LinearBitCt(lwe_ops.add(self.array, rhs.array), noise,
                           _empty_ids(noise.shape), self.context)


@dataclass
class FullWidthCt:
    """8-bit message ciphertext under the big key (FullWidthCiphertext,
    shortint_woppbs_8bit.rs:171-182)."""

    array: jnp.ndarray  # [..., kN+1]
    context: FheContext


def fresh_linear_bitct(arrays, context: FheContext) -> LinearBitCt:
    arrays = jnp.asarray(arrays)
    lanes = arrays.shape[:-1]
    return LinearBitCt(arrays, np.ones(lanes, np.int64), _empty_ids(lanes),
                       context)


class Woppbs8BitByteOps:
    """AES byte ops for this model (fhe_impls/shortint_woppbs_8bit.rs:22-42):
    bootstrap the byte into a FullWidthCt through the LUT, then re-extract the
    8 dual bits."""

    _LUTS: dict = {}

    def __init__(self, ctx: FheContext):
        self.ctx = ctx

    def _lut(self, name, f):
        key = (name, self.ctx.params)
        if key not in self._LUTS:
            self._LUTS[key] = self.ctx.generate_lookup_table(f)
        return self._LUTS[key]

    def _through_lut(self, state: LinearBitCt, lut) -> LinearBitCt:
        fw = self.ctx.bootstrap_from_bits(state, lut)
        return self.ctx.extract_bits_from_ciphertext(fw)

    def sub_bytes(self, state: LinearBitCt) -> LinearBitCt:
        from tfhe_aes2_tpu.aes_128 import SBOX
        return self._through_lut(state, self._lut("sbox", lambda v: int(SBOX[v])))

    def boot(self, word: LinearBitCt) -> LinearBitCt:
        return self._through_lut(word, self._lut("identity", lambda v: v))


def generate_keys(params: WopbsParams = PARAMS_WOPPBS_8BIT, seed: int = 0):
    client, sks = keys_mod.generate_keys(params, seed=seed)
    sks_dev = keys_mod.prepare_server_keys(
        jax.tree_util.tree_map(jnp.asarray, sks), params)
    return client, FheContext(params=params, sks=sks_dev)
