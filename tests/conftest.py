"""Test env: force CPU with 8 virtual devices BEFORE jax initializes, so
sharding/collective tests run without TPU hardware (SURVEY.md §5.5). Kernel
tests use interpret mode on CPU. Benchmarks (bench.py) run on the real chip
and do NOT import this conftest."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
