"""Multi-host (DCN) smoke test: 2-process jax.distributed on localhost CPU.

Exercises :func:`sleap_tpu.parallel.distributed.initialize_multihost` and the
per-host video sharding (:func:`host_frame_range`) that multi-host batch
inference uses (SURVEY §2.12). Each worker initializes the coordination
service, claims its frame shard, and writes it to a results file; the parent
checks the shards tile the full range with no overlap.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from sleap_tpu.parallel.distributed import host_frame_range, initialize_multihost

initialize_multihost(coordinator_address=coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid
r = host_frame_range(1001)
with open(out_path, "w") as f:
    json.dump({"pid": pid, "start": r.start, "stop": r.stop}, f)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_frame_sharding(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    outs = []
    for pid in range(2):
        out_path = tmp_path / f"out{pid}.json"
        outs.append(out_path)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker), coordinator, str(pid), str(out_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    shards = [json.load(open(o)) for o in outs]
    shards.sort(key=lambda s: s["pid"])
    # The two host shards tile [0, 1001) contiguously without overlap.
    assert shards[0]["start"] == 0
    assert shards[0]["stop"] == shards[1]["start"]
    assert shards[1]["stop"] == 1001
    assert shards[0]["stop"] - shards[0]["start"] >= 500
