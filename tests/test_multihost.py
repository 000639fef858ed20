"""Real multi-process jax.distributed test (SURVEY.md §6 distributed-backend
row): 2 CPU processes × 4 virtual devices form one 8-device cluster;
initialize_multihost wires them, global_batch_from_local assembles per-host
shards, and one sharded train step runs across the process boundary. Both
processes must agree on the (replicated) loss."""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed(tmp_path):
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    env = {**os.environ,
           "PYTHONPATH": str(REPO),
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_gqe_cpu_cache"}
    worker = REPO / "tests" / "multihost_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", addr],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out[-1000:], err[-3000:])
        outs.append(out)

    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=(\d+) procs=2 devices=8 "
                      r"loss=([0-9.]+)", out)
        assert m, out[-1000:]
        losses.append(float(m.group(2)))
    # the loss is replicated: every process must read the same value
    assert losses[0] == losses[1], losses
