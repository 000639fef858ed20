"""Fault injection (SURVEY.md §6 failure detection): SIGKILL a training CLI
subprocess mid-run, restart with --resume, and verify it completes from the
last checkpoint instead of from scratch."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _train_cmd(model_dir, data_dir, extra=(), pipeline="host"):
    return [
        sys.executable, "-m", "graphqembed_tpu.cli.train",
        "--data_dir", str(data_dir), "--model_dir", str(model_dir),
        "--embed_dim", "16", "--batch_size", "32", "--max_iter", "300",
        "--max_burn_in", "50", "--val_every", "100000", "--tol", "0",
        "--decoder", "transe", "--ckpt_every", "50",
        "--pipeline", pipeline, *extra,
    ]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("ds")
    env = {**os.environ, "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu"}
    subprocess.run(
        [sys.executable, "-m", "graphqembed_tpu.cli.sample",
         "--out_dir", str(out), "--synthetic_scale", "0.2",
         "--n_train", "60", "--n_val", "10", "--n_test", "5",
         "--n_workers", "1", "--max_negs", "10"],
        check=True, env=env, capture_output=True, timeout=300)
    return out


# device/onthefly run with an EXPLICIT 8-device mesh (the subprocess
# inherits the conftest's 8-virtual-device CPU env): SIGKILL + --resume on
# the SHARDED production trainer — params row-sharded, DP batch split,
# orbax restore onto the mesh (VERDICT r04 task 1). host/stream stay
# single-device (their pipelines are single-device by design).
MESH_FLAGS = {"device": ("--mesh", "8"), "onthefly": ("--mesh", "8")}


@pytest.mark.parametrize("pipeline", ["host", "device", "stream",
                                      "onthefly"])
def test_kill_and_resume(dataset, tmp_path, pipeline):
    model_dir = tmp_path / "run"
    env = {**os.environ, "PYTHONPATH": str(REPO), "JAX_PLATFORMS": "cpu",
           "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_gqe_cpu_cache"}
    mesh_extra = MESH_FLAGS.get(pipeline, ())

    # start training, SIGKILL it once the first checkpoint lands
    proc = subprocess.Popen(_train_cmd(model_dir, dataset, extra=mesh_extra,
                                       pipeline=pipeline),
                            env=env, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    ckpt_root = model_dir / "ckpts"
    deadline = time.time() + 180
    killed = False
    while time.time() < deadline:
        if proc.poll() is not None:
            break  # finished before we could kill it — fine, still test resume
        if ckpt_root.exists() and any(ckpt_root.glob("step_*/meta.json")):
            proc.send_signal(signal.SIGKILL)
            proc.wait()
            killed = True
            break
        time.sleep(0.25)
    assert killed or proc.poll() == 0, "training never checkpointed"

    steps_before = sorted(d.name for d in ckpt_root.glob("step_*"))
    assert steps_before, "no checkpoint written before kill"

    # resume: must complete and end at max_iter (device pipeline rounds to
    # dispatch boundaries, so >= max_iter there)
    out = subprocess.run(_train_cmd(model_dir, dataset,
                                    extra=("--resume", *mesh_extra),
                                    pipeline=pipeline),
                         env=env, capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = json.loads((model_dir / "metrics.json").read_text())
    assert metrics["steps"] >= 300
    final = sorted(d.name for d in ckpt_root.glob("step_*"))
    assert int(final[-1].removeprefix("step_")) >= 300 or pipeline == "device"
