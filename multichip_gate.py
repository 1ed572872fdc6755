"""Standing gate: EXECUTED production-geometry multichip run (per round).

The default driver dryrun compile-checks lvl64 SPMD partitioning on every
round (__graft_entry__.dryrun_multichip); this script additionally EXECUTES
a production-geometry lane-sharded program — 1 block, 1 round (ARK + final
round: keyswitch, 677-step blind rotate, pfKS, vertical packing, the 16-byte
lane axis sharded over the mesh) with real keys, decrypt-verified against
the plain partial-round oracle — and records the result in
MULTICHIP_PROD.json, regenerated and committed every round (VERDICT r3 #5).

Default mode (VERDICT r4 #2): N single-device OS processes forming a real
`jax.distributed` mesh over loopback — one XLA:CPU runtime per device, the
exact code path a multi-host TPU pod launch takes
(tfhe_aes2_tpu/parallel/distributed.py, layout `lanehost`). This sidesteps
the in-process XLA:CPU multi-virtual-device runtime corruption that caps
the old mode at 2 devices (one device's pfKS output shard gets a garbage
GEMM panel at >=4 virtual devices in ANY layout, while every stage is
bit-exact in isolation and 1-/2-device and TPU runs are correct —
minimized repro + elimination ladder: probes/repro_xla_cpu_multidev.py).
--in-process restores the old single-process mode for comparison.

Usage:  python multichip_gate.py [--devices 8] [--out MULTICHIP_PROD.json]
Wall: tens of minutes of f64 CMux GEMMs on a 4-core host.
"""

from __future__ import annotations

import argparse
import datetime
import json
import math
import os
import socket
import subprocess
import sys
import time

_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from tfhe_aes2_tpu.parallel.distributed import main
sys.exit(main(["--coordinator", "127.0.0.1:{port}",
               "--num-processes", "{n}", "--process-id", sys.argv[1],
               "--params", "lvl64", "--rounds", "{rounds}",
               "--blocks-per-device", "1", "--layout", "lanehost"]))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_multiprocess(n: int, rounds: int, timeout: float):
    """N OS processes x 1 CPU device each, lvl64, lanehost layout."""
    repo = os.path.dirname(os.path.abspath(__file__))
    code = _WORKER.format(repo=repo, port=_free_port(), n=n, rounds=rounds)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # default 1 local CPU device per process
    procs = [subprocess.Popen([sys.executable, "-u", "-c", code, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for pid in range(n)]
    timed_out = False
    deadline = time.time() + timeout   # one shared wall budget, not N x
    try:
        outs = [p.communicate(timeout=max(1.0, deadline - time.time()))[0]
                for p in procs]
    except subprocess.TimeoutExpired:
        timed_out = True
        for p in procs:          # kill the exact child PIDs (never pkill)
            if p.poll() is None:
                p.kill()
        outs = [p.communicate()[0] for p in procs]
    for pid, out in enumerate(outs):
        with open(f"/tmp/multichip_gate_worker{pid}.log", "w") as f:
            f.write(out)
    if timed_out:
        return False, "timeout;\n" + "\n".join(
            f"--- process {pid} tail ---\n{o[-600:]}"
            for pid, o in enumerate(outs))
    bad = [pid for pid, (p, out) in enumerate(zip(procs, outs))
           if p.returncode != 0 or f"ok: process {pid} verified" not in out]
    if bad:
        return False, "\n".join(
            f"--- process {pid} rc={procs[pid].returncode} tail ---\n"
            f"{outs[pid][-900:]}" for pid in bad)
    return True, None


def run_in_process(n: int):
    """Old mode: one process, n virtual CPU devices (XLA:CPU runtime races
    at >=4 — kept for comparison / bisection)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __graft_entry__ as g

    try:
        g.dryrun_prod(n, compile_only=False)
        return True, None
    except Exception as e:  # noqa: BLE001
        return False, f"{type(e).__name__}: {e}"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=1)
    ap.add_argument("--timeout", type=float, default=7200.0)
    ap.add_argument("--in-process", action="store_true")
    ap.add_argument("--out", default="MULTICHIP_PROD.json")
    args = ap.parse_args(argv)

    mode = "in-process" if args.in_process else "multi-process"
    lane_shards = (math.gcd(args.devices, 8) if args.in_process
                   else args.devices)
    print(f"[gate] executing lvl64 lane-sharded run ({mode}): "
          f"{args.devices} devices ({lane_shards} lane shards), 1 block, "
          f"{args.rounds} round(s)", file=sys.stderr, flush=True)
    t0 = time.time()
    if args.in_process:
        ok, err = run_in_process(args.devices)
    else:
        ok, err = run_multiprocess(args.devices, args.rounds, args.timeout)
    wall = time.time() - t0

    record = {
        "date": datetime.date.today().isoformat(),
        "params": "PARAMS_SQRD_LVL_64",
        "mode": mode,
        "n_devices": args.devices,
        "processes": 1 if args.in_process else args.devices,
        "lane_shards": lane_shards,
        "blocks": (args.devices // lane_shards if args.in_process else 1),
        "rounds": args.rounds,
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
