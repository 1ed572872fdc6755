"""ctypes bindings for the native C++ client core (native/tfhe_core.cpp).

Builds on demand with cmake+ninja into native/build/. Provides a
deterministic ChaCha20 CSPRNG, LWE encrypt/decrypt, exact negacyclic
multiplication and gadget decomposition — the native client runtime,
cross-validated against the numpy/jnp implementations in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB = None


def _build() -> Path:
    build = _NATIVE_DIR / "build"
    build.mkdir(exist_ok=True)
    lib = build / "libtfhe_core.so"
    if not lib.exists():
        subprocess.run(["cmake", "-G", "Ninja", ".."], cwd=build, check=True,
                       capture_output=True)
        subprocess.run(["ninja"], cwd=build, check=True, capture_output=True)
    return lib


def lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        l = ctypes.CDLL(str(_build()))
        l.tfhe_rng_new.restype = ctypes.c_void_p
        l.tfhe_rng_new.argtypes = [ctypes.c_uint64]
        l.tfhe_rng_free.argtypes = [ctypes.c_void_p]
        u64p = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        l.tfhe_rng_fill_u64.argtypes = [ctypes.c_void_p, u64p, ctypes.c_int64]
        l.tfhe_rng_fill_gaussian.argtypes = [
            ctypes.c_void_p, u64p, ctypes.c_int64, ctypes.c_double]
        if not hasattr(l, "tfhe_rng_fill_u64_par"):
            # stale build from before the threaded fills: rebuild
            subprocess.run(["ninja"], cwd=_NATIVE_DIR / "build", check=True,
                           capture_output=True)
            l = ctypes.CDLL(str(_NATIVE_DIR / "build" / "libtfhe_core.so"))
            raise RuntimeError("rebuilt native lib; reimport required")
        l.tfhe_rng_fill_u64_par.argtypes = [
            ctypes.c_void_p, u64p, ctypes.c_int64]
        l.tfhe_rng_fill_gaussian_par.argtypes = [
            ctypes.c_void_p, u64p, ctypes.c_int64, ctypes.c_double]
        l.tfhe_lwe_encrypt.argtypes = [
            ctypes.c_void_p, u64p, ctypes.c_int64, u64p, ctypes.c_int64,
            ctypes.c_double, u64p]
        l.tfhe_lwe_decrypt_phase.argtypes = [
            u64p, ctypes.c_int64, u64p, ctypes.c_int64, u64p]
        l.tfhe_negacyclic_mul.argtypes = [u64p, u64p, ctypes.c_int64, u64p]
        l.tfhe_decompose.argtypes = [
            u64p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, i32p]
        _LIB = l
    return _LIB


class NativeRng:
    """Deterministic ChaCha20 CSPRNG (the reference's DeterministicSeeder +
    EncryptionRandomGenerator analogue, engine.rs:138-184)."""

    def __init__(self, seed: int):
        self._l = lib()
        self._h = self._l.tfhe_rng_new(ctypes.c_uint64(seed))

    def __del__(self):
        try:
            self._l.tfhe_rng_free(self._h)
        except Exception:
            pass

    def uniform_u64(self, count: int) -> np.ndarray:
        out = np.empty(count, np.uint64)
        self._l.tfhe_rng_fill_u64(self._h, out, count)
        return out

    def gaussian_u64(self, count: int, std_torus: float) -> np.ndarray:
        out = np.empty(count, np.uint64)
        self._l.tfhe_rng_fill_gaussian(self._h, out, count, std_torus)
        return out

    def uniform_u64_par(self, count: int) -> np.ndarray:
        """Threaded fill; deterministic (counter-indexed ChaCha20 blocks,
        independent of thread count) but a DIFFERENT stream than the
        sequential uniform_u64."""
        out = np.empty(count, np.uint64)
        self._l.tfhe_rng_fill_u64_par(self._h, out, count)
        return out

    def gaussian_u64_par(self, count: int, std_torus: float) -> np.ndarray:
        out = np.empty(count, np.uint64)
        self._l.tfhe_rng_fill_gaussian_par(self._h, out, count, std_torus)
        return out

    def lwe_encrypt(self, sk: np.ndarray, msgs: np.ndarray,
                    std_torus: float) -> np.ndarray:
        sk = np.ascontiguousarray(sk, np.uint64)
        msgs = np.ascontiguousarray(msgs, np.uint64)
        n = sk.shape[0]
        out = np.empty((msgs.shape[0], n + 1), np.uint64)
        self._l.tfhe_lwe_encrypt(self._h, sk, n, msgs, msgs.shape[0],
                                 std_torus, out)
        return out


def lwe_decrypt_phase(sk: np.ndarray, cts: np.ndarray) -> np.ndarray:
    sk = np.ascontiguousarray(sk, np.uint64)
    cts = np.ascontiguousarray(cts, np.uint64)
    out = np.empty(cts.shape[0], np.uint64)
    lib().tfhe_lwe_decrypt_phase(sk, sk.shape[0], cts, cts.shape[0], out)
    return out


def negacyclic_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a, np.uint64)
    b = np.ascontiguousarray(b, np.uint64)
    out = np.empty_like(a)
    lib().tfhe_negacyclic_mul(a, b, a.shape[0], out)
    return out


def decompose(xs: np.ndarray, base_log: int, levels: int) -> np.ndarray:
    xs = np.ascontiguousarray(xs, np.uint64)
    out = np.empty((xs.shape[0], levels), np.int32)
    lib().tfhe_decompose(xs, xs.shape[0], base_log, levels, out)
    return out
