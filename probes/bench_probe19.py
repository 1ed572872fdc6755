"""probe19 — attribute the CRT-NTT VP stage's 402ms-vs-54ms XLA-level gap.

The exact NTT lowering (ops/ntt.py) measured 402 ms/round at the VP stage vs
the pallas ladder kernel's 54 at 8 blocks, while the MAC model says ~5x the
other way (PERF.md "CRT-NTT vertical packing"). VERDICT r3 #2: dissect before
building the Mosaic kernel. Phases timed here at the production rotation-stage
shapes (B=128 lanes, G=24 accumulators, R=5 rows, O=5 components, N=512,
n_j=4 kept planes, js=4):

  full       — polymul_digits_ntt_grouped (one VP CMux stage's ext product)
  dig-fwd    — forward transforms of the digits, 4 primes
  ext-fwd    — forward transforms of the GGSW limb planes + weight folding
  pointwise  — the R-contraction broadcast loop, given transformed operands
  inverse    — inverse transforms of the pointwise results
  garner     — CRT reconstruction to u64 (x64-emulated on TPU — suspect #1)
  pallas     — the production ladder kernel at the same shapes, for scale

Slope-timed: each phase runs under lax.scan at two lengths (PROBE_S0/S1,
default 4/12) with the iteration index folded into an operand so XLA cannot
hoist the body; cost = (t1 - t0) / (S1 - S0). Sync via np.asarray checksum
readback (the tunnel acks block_until_ready at dispatch).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    import tfhe_aes2_tpu  # noqa: F401
    from tfhe_aes2_tpu.ops import ntt
    from tfhe_aes2_tpu.ops.params import PARAMS_SQRD_LVL_64

    p = PARAMS_SQRD_LVL_64
    n = p.polynomial_size
    b = int(os.environ.get("PROBE_B", "128"))
    g = int(os.environ.get("PROBE_G", "24"))
    r = p.glwe_dimension + 1          # cbs_level=1
    o = p.glwe_dimension + 1
    n_j, js = 4, 4
    s0 = int(os.environ.get("PROBE_S0", "4"))
    s1 = int(os.environ.get("PROBE_S1", "12"))
    which = os.environ.get(
        "PROBE_WHICH",
        "full,dig-fwd,ext-fwd,pointwise,inverse,garner,pallas").split(",")

    log(f"[p19] backend={jax.default_backend()} B={b} G={g} R={r} O={o} "
        f"N={n} n_j={n_j} scan {s0}/{s1}")

    # warm the constant-matrix caches OUTSIDE any trace (lru-cached device
    # arrays created inside a scan trace leak as tracers)
    for prime in ntt.PRIMES:
        ntt._mat_planes(n, prime, False)
        ntt._mat_planes(n, prime, True)

    rng = np.random.default_rng(0)
    dig = jnp.asarray(rng.integers(-(1 << 12) + 2, (1 << 12) - 2,
                                   (b, g, r, n), dtype=np.int32))
    ext = jnp.asarray(rng.integers(-127, 128, (n_j, b, r, o, 2 * n),
                                   dtype=np.int8))

    def slope(name, body, *ops):
        """body(it, *ops) -> array; it folded in so the scan can't hoist."""

        def run(steps):
            def f(carry, it):
                out = body(it, *ops)
                # fold a scalar of the output into the carry so nothing is DCEd
                return carry + out.reshape(-1)[0].astype(jnp.uint32), None

            fn = jax.jit(lambda: jax.lax.scan(
                f, jnp.uint32(0), jnp.arange(steps, dtype=jnp.int32))[0])
            np.asarray(fn())          # compile+first
            best = None
            for _ in range(3):
                t0 = time.time()
                np.asarray(fn())
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            return best

        t_a, t_b = run(s0), run(s1)
        ms = (t_b - t_a) / (s1 - s0) * 1000
        log(f"[p19] {name}: {ms:.2f} ms/call  (scan {s0}={t_a:.3f}s "
            f"{s1}={t_b:.3f}s)")
        return ms

    # operand perturbation: xor the low bit with (it & 1) — value changes,
    # bounds preserved
    def perturb_dig(it, d):
        return d + (it & 1)

    if "full" in which:
        slope("full", lambda it, d, e: ntt.polymul_digits_ntt_grouped(
            perturb_dig(it, d), e, 1 << 12, j_start=js).astype(jnp.uint32),
            dig, ext)

    # phase bodies reproduce ntt.py's internals piecewise
    def dig_fwd(it, d):
        outs = []
        for prime in ntt.PRIMES:
            outs.append(ntt._transform(perturb_dig(it, d), n, prime))
        return sum(outs)

    if "dig-fwd" in which:
        slope("dig-fwd", dig_fwd, dig)

    def ext_fwd(it, e):
        extt = jnp.transpose(e[..., :n], (1, 3, 2, 0, 4))
        extt = extt + (it & 1).astype(jnp.int8)
        acc = None
        for prime in ntt.PRIMES:
            ep = ntt._transform(extt.astype(jnp.int32), n, prime)
            wts = jnp.asarray([(1 << (8 * j)) % prime for j in range(n_j)],
                              jnp.int32)
            ew = ntt._barrett(
                jnp.sum(ep * wts[:, None], axis=-2, dtype=jnp.int64
                        ).astype(jnp.int32), prime)
            acc = ew if acc is None else acc + ew
        return acc

    if "ext-fwd" in which:
        slope("ext-fwd", ext_fwd, ext)

    # pre-transformed operands for the later phases
    dp = jnp.asarray(rng.integers(-9000, 9000, (b, g, r, n), np.int32))
    ew = jnp.asarray(rng.integers(-9000, 9000, (b, o, r, n), np.int32))

    def pointwise(it, dpx, ewx):
        dpx = dpx + (it & 1)
        pw = None
        for ri in range(r):
            term = dpx[:, :, None, ri, :] * ewx[:, None, :, ri, :]
            pw = term if pw is None else pw + term
        return ntt._barrett(pw, ntt.PRIMES[0])

    if "pointwise" in which:
        ms = slope("pointwise(x1 prime)", pointwise, dp, ew)
        log(f"[p19] pointwise x4 primes ~= {4 * ms:.2f} ms/call")

    pw0 = jnp.asarray(rng.integers(-9000, 9000, (b, g, o, n), np.int32))

    def inverse(it, x):
        outs = []
        for prime in ntt.PRIMES:
            outs.append(ntt._transform(x + (it & 1), n, prime, inverse=True))
        return sum(outs)

    if "inverse" in which:
        slope("inverse", inverse, pw0)

    res = [jnp.asarray(rng.integers(-pp // 2 + 1, pp // 2, (b, g, o, n),
                                    np.int32)) for pp in ntt.PRIMES]

    def garner(it, *rs):
        rs = [x + (it & 1) for x in rs]
        v = ntt._garner_u64(rs, ntt.PRIMES)
        return (v << jnp.uint64(8 * js)).astype(jnp.uint32)

    if "garner" in which:
        slope("garner", garner, *res)

    if "pallas" in which:
        from tfhe_aes2_tpu.ops.pallas import extprod

        def pallas_body(it, d, e):
            return extprod.polymul_digits_pallas_grouped(
                perturb_dig(it, d), e, 1 << 12, j_start=js).astype(jnp.uint32)

        slope("pallas", pallas_body, dig, ext)

    return 0


if __name__ == "__main__":
    sys.exit(main())
