"""Multi-host scaffolding test: a real 2-process CPU jax.distributed job
(gloo collectives over loopback, 4 virtual devices per process) running one
sharded FHE AES step over the (host, chip) mesh — the code path a real
multi-host TPU launch takes (parallel/distributed.py, SURVEY.md §2.5)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
import jax; jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from tfhe_aes2_tpu.parallel.distributed import main
sys.exit(main(["--coordinator", "127.0.0.1:{port}",
               "--num-processes", "2", "--process-id", sys.argv[1],
               "--params", "test", "--rounds", "1",
               "--layout", {layout!r}]))
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


import pytest


@pytest.mark.parametrize("layout", ["dp", "lane", "lanehost"])
def test_two_process_cpu_distributed(layout):
    # dp: blocks over (host, chip) flattened; lane: blocks over 'host' and
    # the 16-byte AES axis over the 4 local 'chip' devices (the composed
    # throughput x latency mapping); lanehost: the byte axis over 'host' —
    # intra-block sharding ACROSS process boundaries, the production-gate
    # layout (multichip_gate.py). Bounded by communicate(timeout=540).
    port = _free_port()
    code = _WORKER.format(repo=REPO, port=port, layout=layout)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # conftest's 8-device count would override
    procs = [subprocess.Popen([sys.executable, "-c", code, str(pid)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for pid in (0, 1)]
    try:
        outs = [p.communicate(timeout=540)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:          # kill BOTH exact child PIDs (never pkill)
            if p.poll() is None:
                p.kill()
        outs = [p.communicate()[0] for p in procs]
        raise AssertionError(
            "distributed rendezvous timed out;\n"
            + "\n".join(o[-1500:] for o in outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"ok: process {pid} verified" in out, out[-3000:]
