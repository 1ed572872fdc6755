"""Standing gate: EXECUTED production-geometry multichip run (per round).

The default driver dryrun compile-checks lvl64 SPMD partitioning on every
round (__graft_entry__.dryrun_multichip); this script additionally EXECUTES
the production-geometry lane-sharded program — 1 block, 1 round (ARK +
final round: keyswitch, 677-step blind rotate, pfKS, vertical packing, all
lane-sharded over the mesh) with real keys on an N-virtual-device CPU mesh,
decrypt-verified against the plain partial-round oracle — and records the
result in MULTICHIP_PROD.json, regenerated and committed every round
instead of living in prose (VERDICT r3 #5).

Usage:  python multichip_gate.py [--devices 2] [--out MULTICHIP_PROD.json]
Wall: tens of minutes of f64 CMux GEMMs on a 4-core host.

Default is 2 devices: running this round's gate at 4 first exposed an
XLA:CPU multi-virtual-device runtime corruption (one device's shard of the
pfKS output gets a garbage ~200-column GEMM panel; shard varies per
process) that hits EVERY 4-device layout at production shapes — including
zero-collective block-DP — while 1- and 2-device runs and all test-params
runs are correct, and every stage is bit-exact in isolation. Minimized
repro + the full elimination ladder: probes/repro_xla_cpu_multidev.py.
The real multi-chip path is TPU; this CPU runtime is simulation-only.
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=2)
    ap.add_argument("--out", default="MULTICHIP_PROD.json")
    args = ap.parse_args(argv)

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as g

    lane_shards = math.gcd(args.devices, 8)
    print(f"[gate] executing lvl64 lane-sharded run: {args.devices} devices "
          f"({lane_shards} lane shards), 1 block, 1 round", file=sys.stderr,
          flush=True)
    t0 = time.time()
    ok, err = True, None
    try:
        g.dryrun_prod(args.devices, compile_only=False)
    except Exception as e:  # noqa: BLE001
        ok, err = False, f"{type(e).__name__}: {e}"
    wall = time.time() - t0

    record = {
        "date": datetime.date.today().isoformat(),
        "params": "PARAMS_SQRD_LVL_64",
        "n_devices": args.devices,
        "lane_shards": lane_shards,
        "blocks": args.devices // lane_shards,
        "rounds": 1,
        "executed": True,
        "decrypt_verified": ok,
        "wall_s": round(wall, 1),
        "error": err,
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(f"[gate] {'OK' if ok else 'FAILED'} in {wall:.0f}s -> {args.out}",
          file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
