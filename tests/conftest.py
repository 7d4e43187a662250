"""Test configuration.

Force JAX onto a simulated 8-device CPU mesh BEFORE jax initialises, so
multi-chip sharding paths are exercised hermetically (the driver separately
dry-runs the multichip path; real TPU benchmarking happens in bench.py).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax may already be imported (sitecustomize preloads it) — the env vars above
# are then too late, but the backend only initialises on first use, so config
# updates still take effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def tmp_project(tmp_path):
    from wise_tpu.project import WiseProject

    return WiseProject(tmp_path / "proj", create_project=True)
