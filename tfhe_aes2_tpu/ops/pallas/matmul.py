"""Fused exact limb-plane contraction: int8 MXU dots + u64 recombination in
one pallas call.

The XLA lowering of `torus.exact_matmul` (keyswitch + pfKS, reference
keyswitch_lwe_ciphertext / private_functional_packing_keyswitch call sites)
materializes every (digit-plane x key-plane) int32 partial product and the
u64-emulated shift/add recombination through HBM — at production pfKS shapes
that is ~15 x 52MB int32 partials plus ~7 x 105MB u64 terms per call. Here
the weight-2^(8s) buckets accumulate in VMEM scratch and a single (lo, hi)
u32 pair leaves the kernel.

Same bucket/recombine structure as the blind-rotate kernels (extprod.py);
no negacirculants — the operand is a plain keyswitch-key matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_tile(extent: int, cap: int) -> int | None:
    """Largest multiple of 128 that divides `extent` and is <= cap."""
    for t in range(min(cap, extent), 127, -128):
        if t % 128 == 0 and extent % t == 0:
            return t
    return None


def eligible(d2_shape, m_shape, bt_max: int = 512, nt_max: int = 512) -> bool:
    """Shapes the fused kernel accepts: d2 [B, K], m planes [nj, K, N] with
    MXU-tileable extents (prepared keys are padded to these at
    keys.prepare_server_keys)."""
    if len(d2_shape) != 2 or len(m_shape) != 3:
        return False
    b, k = d2_shape
    nj, k2, n = m_shape
    return (k2 == k and k % 128 == 0 and b >= 256 and b % 256 == 0
            and _pick_tile(n, nt_max) is not None)


def _kernel(n_d: int, j_start: int, nk: int, d_ref, m_ref, out_ref,
            part_ref):
    """Grid (BT, NT, KT) body — K tiled to bound the Mosaic compile (a
    single K=8192 dot measured a 22-minute compile; kt<=4096 compiles in
    seconds) with the weight buckets accumulating across the K tiles.

    d_ref [n_d, bt, kt] int8; m_ref [8-j_start, kt, nt] int8;
    out_ref [2, bt, nt] uint32; part_ref [8, bt, nt] int32 scratch.
    """
    from jax.experimental import pallas as pl
    from tfhe_aes2_tpu.ops.pallas import extprod

    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        part_ref[...] = jnp.zeros_like(part_ref)

    for j in range(j_start, 8):
        for i in range(n_d):
            s = i + j
            if s >= 8:
                continue
            c = jnp.dot(d_ref[i], m_ref[j - j_start],
                        preferred_element_type=jnp.int32)
            part_ref[s] = part_ref[s] + c

    @pl.when(kk == nk - 1)
    def _fini():
        zero = jnp.zeros(out_ref.shape[1:], jnp.uint32)
        lo, hi = extprod._recombine(j_start, zero, zero, part_ref)
        out_ref[0] = lo
        out_ref[1] = hi


@functools.partial(jax.jit, static_argnames=("j_start", "interpret",
                                              "bt_max", "nt_max", "kt_max"))
def fused_limb_matmul(d_planes, m_planes, j_start: int = 0,
                      interpret: bool | None = None,
                      bt_max: int = 512, nt_max: int = 512,
                      kt_max: int = 4096):
    """u64 [B, N] = Σ_{i,j} 2^(8(i+j)) · (d_planes[i] @ m_planes[j]) mod 2^64.

    d_planes int8 [n_d, B, K] (signed limb planes of gadget digits);
    m_planes int8 [8-j_start, K, N] (limb planes of the u64 key operand,
    lowest j_start planes pre-dropped — ops/truncation.py).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n_d, b, k = d_planes.shape
    nj, k2, n = m_planes.shape
    assert k2 == k and nj == 8 - j_start
    bt = _pick_tile(b, bt_max)
    nt = _pick_tile(n, nt_max)
    kt = _pick_tile(k, kt_max)
    assert bt is not None and nt is not None and kt is not None, (b, n, k)

    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(_kernel, n_d, j_start, k // kt)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(b // bt, n // nt, k // kt),
            in_specs=[
                pl.BlockSpec((n_d, bt, kt), lambda bb, nn, kk: (0, bb, kk)),
                pl.BlockSpec((nj, kt, nt), lambda bb, nn, kk: (0, kk, nn)),
            ],
            out_specs=pl.BlockSpec((2, bt, nt),
                                   lambda bb, nn, kk: (0, bb, nn)),
            out_shape=jax.ShapeDtypeStruct((2, b, n), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((8, bt, nt), jnp.int32)],
            interpret=interpret,
        )(d_planes, m_planes)
    lo = out[0].astype(jnp.uint64)
    hi = out[1].astype(jnp.uint64)
    return lo | (hi << jnp.uint64(32))
