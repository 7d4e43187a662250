"""Test configuration.

Force JAX onto a simulated 8-device CPU mesh BEFORE jax initialises, so
multi-chip sharding paths are exercised hermetically (the driver separately
dry-runs the multichip path; real TPU benchmarking happens in bench.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_project(tmp_path):
    from wise_tpu.project import WiseProject

    return WiseProject(tmp_path / "proj", create_project=True)
