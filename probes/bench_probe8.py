"""Measure achievable MXU rates on this chip: int8 vs bf16 vs f32 matmul,
plain XLA dot vs pallas kernel, at CMux-step shapes.

If int8 doesn't beat bf16, the MXU runs int8 at the bf16 rate and the CMux
kernel's measured ~1.3ms/step IS the dot speed-of-light (13 dots of
[512,512]x[512,512] = 1.74e9 MACs/step/cell-set... see math in comments).

Env: P8_M (default 512), P8_REPS.
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np


def log(m):
    print(f"[p8 {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import tfhe_aes2_tpu  # noqa: F401

    m = int(os.environ.get("P8_M", "512"))
    steps = 256

    rng = np.random.default_rng(0)

    def run_case(name, dtype, mm, kk, nn, n_dots):
        a = jnp.asarray(rng.integers(-100, 100, (n_dots, mm, kk)), dtype)
        b = jnp.asarray(rng.integers(-100, 100, (n_dots, kk, nn)), dtype)
        acct = jnp.int32 if dtype == jnp.int8 else jnp.float32

        @jax.jit
        def run(a, b):
            def body(carry, _):
                outs = []
                for d in range(n_dots):
                    outs.append(jnp.dot(a[d], b[d],
                                        preferred_element_type=acct))
                s = outs[0]
                for o in outs[1:]:
                    s = s + o
                # fold into carry so nothing is dead
                return carry + s[:8, :8].astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.zeros((8, 8), jnp.float32),
                                  None, length=steps)
            return out

        np.asarray(jax.block_until_ready(run(a, b)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(jax.block_until_ready(run(a, b)))
            ts.append(time.time() - t0)
        best = min(ts)
        macs = steps * n_dots * mm * kk * nn
        log(f"{name}: {best*1e3:.1f}ms  {2*macs/best/1e12:.1f} TOPS")

    # CMux-step shape: 13 dots [512,512]x[512,512] per (o? actually per o,r
    # cell: but rate is what matters)
    for dt, nm in ((jnp.int8, "int8"), (jnp.bfloat16, "bf16"),
                   (jnp.float32, "f32")):
        run_case(f"xla {nm} 13x[{m},512]x[512,512]", dt, m, 512, 512, 13)
    run_case("xla int8 [512,7680]x[7680,512]", jnp.int8, m, 7680, 512, 1)

    # pallas: one dot per cell, grid over n_dots — the kernel context
    def pallas_rate(name, dtype, mm, kk, nn, n_dots):
        acct = jnp.int32 if dtype == jnp.int8 else jnp.float32
        a = jnp.asarray(rng.integers(-100, 100, (n_dots, mm, kk)), dtype)
        b = jnp.asarray(rng.integers(-100, 100, (n_dots, kk, nn)), dtype)

        def kern(a_ref, b_ref, o_ref):
            o_ref[0] = jnp.dot(a_ref[0], b_ref[0],
                               preferred_element_type=acct)

        @jax.jit
        def run(a, b):
            def body(carry, _):
                with jax.enable_x64(False):
                    out = pl.pallas_call(
                        kern,
                        grid=(n_dots,),
                        in_specs=[pl.BlockSpec((1, mm, kk), lambda d: (d, 0, 0)),
                                  pl.BlockSpec((1, kk, nn), lambda d: (d, 0, 0))],
                        out_specs=pl.BlockSpec((1, mm, nn), lambda d: (d, 0, 0)),
                        out_shape=jax.ShapeDtypeStruct((n_dots, mm, nn), acct),
                    )(a, b)
                return carry + out[0, :8, :8].astype(jnp.float32), None
            out, _ = jax.lax.scan(body, jnp.zeros((8, 8), jnp.float32),
                                  None, length=steps)
            return out

        np.asarray(jax.block_until_ready(run(a, b)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(jax.block_until_ready(run(a, b)))
            ts.append(time.time() - t0)
        best = min(ts)
        macs = steps * n_dots * mm * kk * nn
        log(f"{name}: {best*1e3:.1f}ms  {2*macs/best/1e12:.1f} TOPS")

    pallas_rate(f"pallas int8 13x[{m},512]x[512,512]", jnp.int8, m, 512, 512, 13)
    pallas_rate(f"pallas bf16 13x[{m},512]x[512,512]", jnp.bfloat16, m, 512, 512, 13)
    return 0


if __name__ == "__main__":
    sys.exit(main())
