"""Key generation (client side, host/CPU, numpy u64).

TPU-native equivalent of the reference's keygen
(`shortint::gen_keys` + `WopbsKey::new_wopbs_key_only_for_wopbs`,
shortint_woppbs_1bit.rs:245-268): generates

  - small LWE secret key  s  ∈ {0,1}^n
  - GLWE secret key       S  ∈ ({0,1}^N)^k ; flattened = the "big" LWE key s'
  - BSK: bootstrap key — GGSW_S(s_i) per small-key bit, gadget (pbs_level,
    pbs_base_log)
  - KSK: big->small LWE keyswitch key, gadget (ks_level, ks_base_log)
  - PFPKSK[u], u=0..k: private functional packing keyswitch keys for the
    circuit-bootstrap functions f_u(x) = -x·S_u (u<k) and f_k(x) = x

Client-side bit encryption follows the reference exactly: fresh bits are
encrypted under the *big* key with the lwe noise distribution
(shortint_woppbs_1bit.rs:200-217), bit scaled to 2^63.

All of this runs client-side on the host; only the evaluation keys (a pytree
of u64 tensors) ship to the TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import numpy as np

from tfhe_aes2_tpu.ops.params import WopbsParams

Q_BITS = 64


class ServerKeySet(NamedTuple):
    """Evaluation keys (device tensors; a jax pytree).

    bsk:     [n, pbs_level, k+1(row u), k+1(component), N] u64
             row (l, u) = GLWE_enc(0) + s_i·g_l at component u
    ksk:     [kN, ks_level, n+1] u64 — LWE_s(s'_i · g_l)
    pfpksk:  [kN+1(pos), pfks_level, k+1(fn u), k+1(component), N] u64
             pos i<kN: GLWE_S(s'_i · f_u(g_l)); pos kN: GLWE_S(f_u(g_l))
             (contraction-friendly layout: one matmul applies all k+1
             functions at once)
    pksk:    [n, ks_level, k+1, N] u64 — GLWE_S(s_i · g_l) (LWE->GLWE packing
             keyswitch key, for the shortint_1bit tree-PBS model,
             shortint_1bit.rs:179-190)
    """

    bsk: np.ndarray
    ksk: np.ndarray
    pfpksk: np.ndarray
    pksk: np.ndarray


@dataclass
class ClientKey:
    params: WopbsParams
    lwe_sk: np.ndarray    # [n] u64 in {0,1}
    glwe_sk: np.ndarray   # [k, N] u64 in {0,1}
    rng: np.random.Generator

    @property
    def big_sk(self) -> np.ndarray:
        """Flattened GLWE key: s'_{u·N + i} = S_u[i]."""
        return self.glwe_sk.reshape(-1)

    # -- client-side encryption (reference ClientKeyT, src/tfhe.rs:11-17) --

    def encrypt_bits(self, bits) -> np.ndarray:
        """bits [...] in {0,1} -> LWE cts [..., kN+1] u64 under the big key."""
        bits = np.asarray(bits, dtype=np.uint64)
        shape = bits.shape
        n = self.params.big_lwe_dimension
        a = _uniform_u64(self.rng, shape + (n,))
        e = _gaussian_u64(self.rng, self.params.lwe_noise_std, shape)
        m = bits << np.uint64(63)
        b = _wrap_dot(a, self.big_sk) + m + e
        return np.concatenate([a, b[..., None]], axis=-1)

    def decrypt_bits(self, cts) -> np.ndarray:
        """LWE cts [..., kN+1] -> bits [...] via threshold decode."""
        cts = np.asarray(cts, dtype=np.uint64)
        phase = cts[..., -1] - _wrap_dot(cts[..., :-1], self.big_sk)
        return ((phase + np.uint64(1 << 62)) >> np.uint64(63)) & np.uint64(1)

    def decrypt_phase(self, cts) -> np.ndarray:
        """Raw phase (message + noise) — for noise diagnostics."""
        cts = np.asarray(cts, dtype=np.uint64)
        return cts[..., -1] - _wrap_dot(cts[..., :-1], self.big_sk)

    # -- small-key variants (the 8-bit model encrypts bits under the small
    #    LWE key, shortint_woppbs_8bit.rs:206-232) --

    def encrypt_bits_small(self, bits) -> np.ndarray:
        bits = np.asarray(bits, dtype=np.uint64)
        n = self.params.lwe_dimension
        a = _uniform_u64(self.rng, bits.shape + (n,))
        e = _gaussian_u64(self.rng, self.params.lwe_noise_std, bits.shape)
        b = _wrap_dot(a, self.lwe_sk) + (bits << np.uint64(63)) + e
        return np.concatenate([a, b[..., None]], axis=-1)

    def decrypt_bits_small(self, cts) -> np.ndarray:
        cts = np.asarray(cts, dtype=np.uint64)
        phase = cts[..., -1] - _wrap_dot(cts[..., :-1], self.lwe_sk)
        return ((phase + np.uint64(1 << 62)) >> np.uint64(63)) & np.uint64(1)

    def encrypt_encodings_small(self, encodings) -> np.ndarray:
        """Encrypt raw torus encodings [...] under the small key (the
        shortint_1bit model encodes bits at 2^62, shortint_1bit.rs:352-356)."""
        encodings = np.asarray(encodings, dtype=np.uint64)
        n = self.params.lwe_dimension
        a = _uniform_u64(self.rng, encodings.shape + (n,))
        e = _gaussian_u64(self.rng, self.params.lwe_noise_std, encodings.shape)
        b = _wrap_dot(a, self.lwe_sk) + encodings + e
        return np.concatenate([a, b[..., None]], axis=-1)

    def decrypt_phase_small(self, cts) -> np.ndarray:
        cts = np.asarray(cts, dtype=np.uint64)
        return cts[..., -1] - _wrap_dot(cts[..., :-1], self.lwe_sk)

    def encrypt_encodings_big(self, encodings) -> np.ndarray:
        """Encrypt raw torus encodings [...] under the big key (used for the
        8-bit model's full-width ciphertexts, message at 2^(64-8))."""
        encodings = np.asarray(encodings, dtype=np.uint64)
        n = self.params.big_lwe_dimension
        a = _uniform_u64(self.rng, encodings.shape + (n,))
        e = _gaussian_u64(self.rng, self.params.lwe_noise_std, encodings.shape)
        b = _wrap_dot(a, self.big_sk) + encodings + e
        return np.concatenate([a, b[..., None]], axis=-1)


# ---------------------------------------------------------------- helpers

def _uniform_u64(rng: np.random.Generator, shape) -> np.ndarray:
    # full-range draw: the bounded path (integers(0, 2^64)) takes a ~200x
    # slower rejection branch in numpy
    return rng.integers(0, np.iinfo(np.uint64).max, size=shape,
                        dtype=np.uint64, endpoint=True)


class _KeygenRng:
    """Fill source for the large evaluation-key tensors: threaded ChaCha20
    from the native core when it builds (fills at memory speed on all cores;
    deterministic — ChaCha20 is counter-mode, so the stream is independent of
    thread count), numpy fallback otherwise. Secret keys and client-side bit
    encryption keep using the numpy Generator passed around separately."""

    def __init__(self, seed: int):
        self._np = np.random.default_rng(seed ^ 0x6B65_7967)  # fallback only
        try:
            from tfhe_aes2_tpu import native
            self._native = native.NativeRng(seed)
        except Exception:
            self._native = None

    def uniform(self, shape) -> np.ndarray:
        if self._native is None:
            return _uniform_u64(self._np, shape)
        count = int(np.prod(shape, dtype=np.int64))
        return self._native.uniform_u64_par(count).reshape(shape)

    def gaussian(self, std_torus: float, shape) -> np.ndarray:
        if self._native is None:
            return _gaussian_u64(self._np, std_torus, shape)
        count = int(np.prod(shape, dtype=np.int64))
        return self._native.gaussian_u64_par(count, std_torus).reshape(shape)


_CPU_CAST = None


def _round_wrap_u64(e: np.ndarray) -> np.ndarray:
    """rint + wrap-to-u64 of an f64 array. numpy's f64 elementwise loops run
    ~10 MB/s on some hosts; route big arrays through a jitted XLA-CPU kernel
    (~60x faster), keeping numpy for small ones (avoids jit churn)."""
    if e.size < (1 << 16):
        return np.rint(e).astype(np.int64).astype(np.uint64)
    global _CPU_CAST
    import jax
    import jax.numpy as jnp
    if _CPU_CAST is None:
        _CPU_CAST = jax.jit(
            lambda x: jnp.rint(x).astype(jnp.int64).astype(jnp.uint64))
    # local_devices: under jax.distributed, devices() lists other processes'
    # (non-addressable) devices too — pinning one of those breaks keygen
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        return np.asarray(_CPU_CAST(e.reshape(-1))).reshape(e.shape)


def _gaussian_u64(rng: np.random.Generator, std_torus: float, shape) -> np.ndarray:
    """Gaussian noise with std = std_torus * 2^64, wrapped to u64."""
    std = std_torus * (2.0 ** Q_BITS)
    return _round_wrap_u64(rng.normal(0.0, std, size=shape))


def _wrap_dot(a: np.ndarray, s: np.ndarray) -> np.ndarray:
    """Wrapping u64 dot product over the last axis."""
    with np.errstate(over="ignore"):
        return (a * s).sum(axis=-1, dtype=np.uint64)


def _nc_matrix_np(poly: np.ndarray) -> np.ndarray:
    """numpy negacirculant of [N] u64 -> [N(j), N(m)]; (a⊛p)[m] = Σ_j a[j]·NC[j,m]."""
    n = poly.shape[-1]
    ext = np.concatenate([poly, np.uint64(0) - poly])
    j = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    return ext[(m - j) % (2 * n)]


def _wrap_matmul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Wrapping u64 matmul (numpy integer matmul is modular)."""
    with np.errstate(over="ignore"):
        return a @ b


class _GlweEncryptor:
    """Vectorized GLWE encryption under binary S.

    Body = Σ_u A_u ⊛ S_u computed exactly as four f64 BLAS GEMMs: A is split
    into 16-bit limb planes and multiplied against the signed negacirculant of
    S (entries in {-1, 0, 1}), so every product sum stays below
    2^16·k·N « 2^53.
    """

    def __init__(self, params: WopbsParams, glwe_sk: np.ndarray,
                 rng: "_KeygenRng"):
        self.params = params
        self.rng = rng
        k, n = glwe_sk.shape
        # signed NC stack [kN, N] f64 with entries in {-1, 0, 1}
        blocks = []
        j = np.arange(n)[:, None]
        m = np.arange(n)[None, :]
        idx = (m - j) % (2 * n)
        for u in range(k):
            ext = np.concatenate([glwe_sk[u].astype(np.int64),
                                  -glwe_sk[u].astype(np.int64)])
            blocks.append(ext[idx].astype(np.float64))
        self.nc_signed = np.concatenate(blocks, axis=0)  # [kN, N]

    def encrypt_zero(self, rows: int, noise_std: float):
        """-> (A [rows, k, N], B [rows, N])"""
        p = self.params
        k, n = p.glwe_dimension, p.polynomial_size
        a = self.rng.uniform((rows, k, n))
        e = self.rng.gaussian(noise_std, (rows, n))
        a2 = a.reshape(rows, k * n)
        b = e.copy()
        with np.errstate(over="ignore"):
            b += _wrap_body_cpu(a2, self.nc_signed)
        return a, b


_CPU_BODY = None


def _wrap_body_cpu(a2: np.ndarray, nc_signed: np.ndarray) -> np.ndarray:
    """Exact wrapping-u64 A·NC(S) via f64 limb GEMMs on the XLA-CPU backend
    (multi-threaded Eigen; each 16-bit limb-plane sum stays below 2^53).
    Chunked to bound the f64 temporaries."""
    global _CPU_BODY
    import jax
    import jax.numpy as jnp
    if _CPU_BODY is None:
        def _body(a2c, nc):
            acc = jnp.zeros((a2c.shape[0], nc.shape[1]), dtype=jnp.uint64)
            for limb in range(4):
                pl = ((a2c >> jnp.uint64(16 * limb))
                      & jnp.uint64(0xFFFF)).astype(jnp.float64)
                coeff = jnp.rint(pl @ nc).astype(jnp.int64).astype(jnp.uint64)
                acc = acc + (coeff << jnp.uint64(16 * limb))
            return acc

        _CPU_BODY = jax.jit(_body)
    rows = a2.shape[0]
    chunk = 8192
    out = np.empty((rows, nc_signed.shape[1]), dtype=np.uint64)
    # local_devices: under jax.distributed, devices() lists other processes'
    # (non-addressable) devices too — pinning one of those breaks keygen
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        for lo in range(0, rows, chunk):
            hi = min(lo + chunk, rows)
            out[lo:hi] = np.asarray(_CPU_BODY(a2[lo:hi], nc_signed))
    return out


def prepare_server_keys(sks: ServerKeySet, params: WopbsParams) -> ServerKeySet:
    """Pre-split the evaluation keys into the int8 limb-plane layouts the TPU
    kernels consume, so no per-call split/transpose of ~400MB key tensors
    runs inside the hot jits (blind rotate re-derived its plane tensor on
    every PBS call — ~0.17ms of the 0.91ms production CMux step).

    bsk    -> blind-rotate scan planes [n, k+1, R, 8-js, 2N] int8
    ksk    -> keyswitch planes [8-js, kN, L, n+1] int8
    pfpksk -> pfKS planes [8-js, kN+1, L, k+1, k+1, N] int8
    pksk stays u64 (cold path: shortint_1bit packing keyswitch only).

    Each key keeps only the limb planes above its noise floor (per-key js
    from ops/truncation.py — at production the KSK drops 6 of 8 planes);
    consumers recover js from the plane count. The consumers sniff the int8
    dtype; raw u64 keys keep working (CPU mode and the conv/matmul lowerings
    need them). Call this on DEVICE arrays after transfer; only meaningful
    off-CPU."""
    import jax

    from tfhe_aes2_tpu.ops import blind_rotate as br
    from tfhe_aes2_tpu.ops import truncation
    from tfhe_aes2_tpu.ops.torus import split_u64_signed

    if jax.default_backend() == "cpu":
        # CPU lowers through matmul/conv modes that need the raw u64 keys
        return sks
    if jax.numpy.dtype(getattr(sks.bsk, "dtype", "uint64")) == jax.numpy.int8:
        return sks  # already prepared (idempotent)

    def split_trunc(key, js, pad_axis=None, pad_to=None):
        # pad_axis/pad_to: zero-pad one axis to an MXU-tileable extent so the
        # fused contraction kernel (ops/pallas/matmul.py) accepts the planes;
        # zero rows/columns contribute nothing (consumers slice outputs or
        # zero-pad the matching digit rows).
        def f(x):
            p = split_u64_signed(x)[js:]
            if pad_axis is not None and p.shape[pad_axis] < pad_to:
                widths = [(0, 0)] * p.ndim
                widths[pad_axis] = (0, pad_to - p.shape[pad_axis])
                p = jax.numpy.pad(p, widths)
            return p
        return jax.jit(f)(key)

    def ceil_to(x, m):
        return -(-x // m) * m

    bsk_p = jax.jit(br.prepare_bsk, static_argnames=("params",))(
        sks.bsk, params=params)
    # ksk planes [nj, kN, L, n+1]: output axis n+1 padded to a lane multiple
    ksk_p = split_trunc(sks.ksk, truncation.ksk_j_start(params),
                        pad_axis=3, pad_to=ceil_to(sks.ksk.shape[-1], 128))
    # pfpksk planes [nj, kN+1, L, U, k+1, N]: the contraction axis
    # (kN+1)·L padded to a multiple of 128 via the kN+1 row axis
    kn1 = sks.pfpksk.shape[0]
    lvl = sks.pfpksk.shape[1]
    kn1_pad = ceil_to(kn1, 128 // lvl) if 128 % lvl == 0 else kn1
    pfpksk_p = split_trunc(sks.pfpksk, truncation.pfpksk_j_start(params),
                           pad_axis=1, pad_to=kn1_pad)
    return ServerKeySet(bsk=bsk_p, ksk=ksk_p, pfpksk=pfpksk_p, pksk=sks.pksk)


def generate_keys(params: WopbsParams, seed: int = 0) -> tuple[ClientKey, ServerKeySet]:
    """Generate the client key and all evaluation keys."""
    rng = np.random.default_rng(seed)
    p = params
    n, k, N = p.lwe_dimension, p.glwe_dimension, p.polynomial_size
    k1 = k + 1
    kN = k * N

    lwe_sk = rng.integers(0, 2, size=(n,), dtype=np.uint64)
    glwe_sk = rng.integers(0, 2, size=(k, N), dtype=np.uint64)
    client = ClientKey(params=p, lwe_sk=lwe_sk, glwe_sk=glwe_sk, rng=rng)
    big_sk = client.big_sk

    krng = _KeygenRng(seed)
    enc = _GlweEncryptor(p, glwe_sk, krng)

    # ---- BSK: GGSW_S(s_i), rows (l, u): enc(0) + s_i·g_l at component u ----
    L = p.pbs_level
    rows = n * L * k1
    a, b = enc.encrypt_zero(rows, p.glwe_noise_std)
    bsk = np.concatenate([a, b[:, None, :]], axis=1)       # [rows, k+1, N]
    bsk = bsk.reshape(n, L, k1, k1, N)
    with np.errstate(over="ignore"):
        for l in range(L):
            g = np.uint64(1 << (64 - p.pbs_base_log * (l + 1)))
            for u in range(k1):
                bsk[:, l, u, u, 0] += lwe_sk * g
    # ---- KSK: LWE_s(s'_i · g_l) ----
    Lk = p.ks_level
    a = krng.uniform((kN, Lk, n))
    e = krng.gaussian(p.lwe_noise_std, (kN, Lk))
    with np.errstate(over="ignore"):
        body = _wrap_dot(a, lwe_sk) + e
        for l in range(Lk):
            g = np.uint64(1 << (64 - p.ks_base_log * (l + 1)))
            body[:, l] += big_sk * g
    ksk = np.concatenate([a, body[..., None]], axis=-1)    # [kN, Lk, n+1]

    # ---- PFPKSK: GLWE_S(s'_i·f_u(g_l)) with an extra row for the body ----
    Lp = p.pfks_level
    rows = (kN + 1) * Lp * k1
    a, b = enc.encrypt_zero(rows, p.pfks_noise_std)
    pfpksk = np.concatenate([a, b[:, None, :]], axis=1).reshape(kN + 1, Lp, k1, k1, N)
    with np.errstate(over="ignore"):
        s_ext = np.concatenate([big_sk, np.uint64([1])])   # position kN is the body (coeff 1)
        for u in range(k1):
            for l in range(Lp):
                g = np.uint64(1 << (64 - p.pfks_base_log * (l + 1)))
                if u < k:
                    # f_u(x) = -x·S_u : message poly = -(s'_i·g_l)·S_u
                    msg = (np.uint64(0) - (s_ext * g))[:, None] * glwe_sk[u][None, :]
                    pfpksk[:, l, u, k, :] += msg
                else:
                    # f_k(x) = x : constant poly s'_i·g_l
                    pfpksk[:, l, u, k, 0] += s_ext * g

    # ---- PKSK: GLWE_S(s_i · g_l) for LWE->GLWE packing keyswitch ----
    rows = n * Lk
    a, b = enc.encrypt_zero(rows, p.lwe_noise_std)
    pksk = np.concatenate([a, b[:, None, :]], axis=1).reshape(n, Lk, k1, N)
    with np.errstate(over="ignore"):
        for l in range(Lk):
            g = np.uint64(1 << (64 - p.ks_base_log * (l + 1)))
            pksk[:, l, k, 0] += lwe_sk * g

    return client, ServerKeySet(bsk=bsk, ksk=ksk, pfpksk=pfpksk, pksk=pksk)


def server_key_shapes(params: WopbsParams) -> ServerKeySet:
    """ShapeDtypeStructs of a raw (u64) ServerKeySet at `params` — lets AOT
    warm-up and partitioning checks lower+compile without paying keygen
    (generate_keys layouts; prepared layouts via
    jax.eval_shape(prepare_server_keys, ...))."""
    import jax
    import jax.numpy as jnp

    p = params
    n, k, big_n = p.lwe_dimension, p.glwe_dimension, p.polynomial_size
    kn = k * big_n
    sd = lambda *s: jax.ShapeDtypeStruct(s, jnp.uint64)
    return ServerKeySet(
        bsk=sd(n, p.pbs_level, k + 1, k + 1, big_n),
        ksk=sd(kn, p.ks_level, n + 1),
        pfpksk=sd(kn + 1, p.pfks_level, k + 1, k + 1, big_n),
        pksk=sd(n, p.ks_level, k + 1, big_n))
