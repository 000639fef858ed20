"""Test env: force CPU with 8 virtual devices BEFORE jax initializes, so
sharding/collective tests run without TPU hardware (SURVEY.md §5.5). Kernel
tests use interpret mode on CPU. Benchmarks (bench.py) run on the real chip
and do NOT import this conftest."""

import os
import sys

# This box boots every python with PYTHONPATH=/root/.axon_site, whose
# sitecustomize registers the axon TPU PJRT plugin at interpreter start —
# BEFORE conftest runs — which both selects the TPU platform and consumes
# XLA_FLAGS, so neither JAX_PLATFORMS nor xla_force_host_platform_device_count
# set here can take effect. Tests need the simulated 8-device CPU mesh
# (SURVEY.md §5.5), so if the env wasn't prepared, re-exec the test process
# once with a corrected environment (PYTHONPATH override disables the axon
# sitecustomize; repo root stays importable).
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ENV_OK = ("axon_site" not in os.environ.get("PYTHONPATH", "")
           and os.environ.get("JAX_PLATFORMS") == "cpu"
           and "xla_force_host_platform_device_count"
           in os.environ.get("XLA_FLAGS", ""))
if not _ENV_OK and os.environ.get("_GQE_TEST_REEXEC") != "1":
    import subprocess

    import pytest

    env = dict(os.environ)
    env["_GQE_TEST_REEXEC"] = "1"
    env["PYTHONPATH"] = _REPO_ROOT
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_gqe_cpu_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *sys.argv[1:]],
        env=env, capture_output=True, text=True)
    banner = ("[conftest] re-ran tests in a subprocess with the CPU-mesh env "
              "(the axon TPU sitecustomize claims JAX before conftest can):\n")
    out = banner + proc.stdout + proc.stderr

    # pytest has already redirected fd 1/2 to capture temp files, but keeps
    # dup()s of the originals open — find the dup'd original (a pipe/char-dev
    # when run at a terminal, or a writable still-linked regular file when
    # stdout is `> log` redirected; pytest's own capture temps are unlinked,
    # nlink==0) and write the child's output there, then exit with the
    # child's code (pytest.exit can't relay a returncode from conftest
    # import — it maps to exit 4 regardless).
    import fcntl
    import stat

    data = out.encode()

    def try_write(fd, st) -> bool:
        try:
            os.write(fd, data)
            return True
        except OSError:
            return False

    # Prefer FIFO/chardev fds (the dup'd terminal stdout — the common case)
    # over regular files: an unrelated writable regular file at a lower fd
    # (a --junitxml report, coverage data, a log) would both swallow the
    # output and be corrupted at its current offset. The regular-file
    # fallback (the `pytest > log` case; the redirect target is not
    # identifiable once pytest has re-pointed fd 1 at its capture temp)
    # seeks to END first so a mis-chosen report file is appended to, never
    # overwritten mid-file.
    fds = []
    for fd in range(3, 64):
        try:
            fds.append((fd, os.fstat(fd)))
        except OSError:
            continue
    for fd, st in fds:
        if stat.S_ISFIFO(st.st_mode) or stat.S_ISCHR(st.st_mode):
            if try_write(fd, st):
                os._exit(proc.returncode)
    for fd, st in fds:
        if (stat.S_ISREG(st.st_mode) and st.st_nlink > 0
                and (fcntl.fcntl(fd, fcntl.F_GETFL)
                     & (os.O_WRONLY | os.O_RDWR))):
            try:
                os.lseek(fd, 0, os.SEEK_END)
            except OSError:
                continue
            if try_write(fd, st):
                os._exit(proc.returncode)
    pytest.exit(out, returncode=proc.returncode)

# persistent compile cache: repeat test runs skip XLA compilation
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_gqe_cpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from graphqembed_tpu.graph.synthetic import holdout_edges, synthetic_graph  # noqa: E402


@pytest.fixture(scope="session")
def graph():
    return synthetic_graph(seed=7, scale=0.5, avg_degree=6.0)


@pytest.fixture(scope="session")
def train_and_held(graph):
    return holdout_edges(graph, frac=0.1, seed=3)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
