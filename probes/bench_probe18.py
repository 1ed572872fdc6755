"""Probe 18: NTT-based vertical-packing external product (design study).

The VP stage is ~80% per-lane negacirculant ladder builds (PERF.md): 25
per-lane polys x N shifts x 2N cols of VMEM traffic per step that no
restructuring removed (scratch ladders, slots, stacking all measured
negative). An exact negacyclic NTT over two CRT primes replaces the ladders
with matmuls against SHARED constant transform matrices (MXU work, no
per-poly data movement):

  forward:  X_p[row, m] = sum_j x[row, j] * W_p[j, m]   (mod p)
            W_p[j, m] = psi^j * omega^{j m} — the negacyclic twist folded in
  pointwise: P_p[g, o, m] = sum_r D_p[g, r, m] * E_p[o, r, m]  (mod p)
  inverse:  per 8-bit plane pair (i, j): iNTT -> CRT -> weight 2^{8(i+j)}
            recombine mod 2^64.

Primes 12289, 13313 (both = 1 mod 2N for N=512; product 2^27.3 covers the
int8-plane conv bound N*127*127 < 2^23; 5-row lazy accumulation fits i32).

Stage 1 (this probe, CPU): exactness of the CRT/NTT pipeline vs the
production polymul on random VP-shaped data. Stage 2: Mosaic kernel timing.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P1, P2 = 12289, 13313


def _find_psi(p: int, two_n: int) -> int:
    """A primitive 2N-th root of unity mod p."""
    for g in range(2, p):
        if pow(g, (p - 1) // 2, p) != 1:   # generator candidate test
            psi = pow(g, (p - 1) // two_n, p)
            # primitive: psi^N == -1
            if pow(psi, two_n // 2, p) == p - 1:
                return psi
    raise ValueError("no root")


def ntt_matrices(n: int, p: int):
    """(W, Winv) [N, N] int64: negacyclic forward/inverse transforms as
    dense matmuls — W[j, m] = psi^(2m j + j) ... standard twisted DFT:
    X[m] = sum_j x[j] psi^j omega^{jm}, omega = psi^2."""
    psi = _find_psi(p, 2 * n)
    omega = psi * psi % p
    j = np.arange(n)
    # W[j, m] = psi^j * omega^(j*m)
    pow_tbl = np.ones((n, n), np.int64)
    om = np.array([pow(int(omega), int(jm), p) for jm in range(n)], np.int64)
    # omega^(j*m) = om[(j*m) % n] since omega^n = 1
    jm = (j[:, None] * j[None, :]) % n
    W = (om[jm] * np.array([pow(int(psi), int(x), p) for x in j],
                           np.int64)[:, None]) % p
    # inverse: x[j] = n^-1 psi^-j sum_m X[m] omega^(-jm)
    ninv = pow(int(n), p - 2, p)
    psi_inv = pow(int(psi), p - 2, p)
    om_inv = np.array([pow(pow(int(omega), p - 2, p), int(x), p)
                       for x in range(n)], np.int64)
    Winv = (om_inv[jm] * np.array([pow(int(psi_inv), int(x), p)
                                   for x in j], np.int64)[None, :]) % p
    Winv = Winv * ninv % p
    return W, Winv


def negacyclic_conv_ref(a, b, n):
    """Exact negacyclic conv of int arrays [..., N] via object ints."""
    out = np.zeros(a.shape[:-1] + (n,), object)
    af = a.astype(object)
    bf = b.astype(object)
    for j in range(n):
        for m in range(n):
            t = (j + m)
            if t < n:
                out[..., t] += af[..., j] * bf[..., m]
            else:
                out[..., t - n] -= af[..., j] * bf[..., m]
    return out


def main() -> int:
    n = 64   # small N for the CPU exactness check (primes still = 1 mod 2N)
    rng = np.random.default_rng(0)
    g_cnt, r_cnt, o_cnt = 3, 2, 2

    dig = rng.integers(-128, 128, (g_cnt, r_cnt, n)).astype(np.int64)
    ext = rng.integers(-128, 128, (o_cnt, r_cnt, n)).astype(np.int64)

    # reference: sum_r negacyclic(dig[g,r], ext[o,r])
    ref = np.zeros((g_cnt, o_cnt, n), object)
    for g in range(g_cnt):
        for o in range(o_cnt):
            for r in range(r_cnt):
                ref[g, o] += negacyclic_conv_ref(dig[g, r], ext[o, r], n)

    crt = []
    for p in (P1, P2):
        W, Winv = ntt_matrices(n, p)
        D = (dig % p) @ W % p                      # [G, R, N]
        E = (ext % p) @ W % p                      # [O, R, N]
        # pointwise with R contraction (lazy i64 sum then mod)
        P = np.einsum("grm,orm->gom", D, E) % p    # [G, O, N]
        out = P @ Winv % p
        crt.append(out)

    # CRT reconstruct to signed ints
    m1inv = pow(P1, P2 - 2, P2)
    x1, x2 = crt
    t = (x2 - x1) * m1inv % P2
    val = x1 + t * P1                               # in [0, P1*P2)
    half = P1 * P2 // 2
    val = np.where(val > half, val - P1 * P2, val)

    ok = (val.astype(object) == ref).all()
    print(f"[probe18] CRT-NTT exactness vs schoolbook negacyclic: {ok}")
    assert ok
    return 0


if __name__ == "__main__":
    sys.exit(main())
