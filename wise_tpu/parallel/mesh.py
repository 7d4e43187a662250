"""Device mesh helpers.

The framework uses one global mesh with axes:

- ``dp`` — data/batch parallelism for encoders, and DB-row sharding for the
  index scan (each chip scans its HBM-resident shard; global top-k merge
  rides ICI collectives).
- ``mp`` — model/tensor parallelism for large encoder variants.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(dp: int = -1, mp: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if dp == -1:
        dp = len(devices) // mp
    if dp * mp > len(devices):
        raise ValueError(f"mesh {dp}x{mp} needs {dp*mp} devices, have {len(devices)}")
    dev_array = np.array(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(dev_array, axis_names=("dp", "mp"))


def get_pp_mesh(pp: int, dp: int = -1, devices=None) -> Mesh:
    """('pp', 'dp') mesh for pipeline-parallel training
    (parallel/pipeline.py): successive pipeline stages along 'pp', batch
    along 'dp'."""
    devices = list(devices if devices is not None else jax.devices())
    if dp == -1:
        dp = len(devices) // pp
    if pp * dp > len(devices):
        raise ValueError(
            f"mesh {pp}x{dp} needs {pp * dp} devices, have {len(devices)}"
        )
    return Mesh(
        np.array(devices[: pp * dp]).reshape(pp, dp),
        axis_names=("pp", "dp"),
    )


def shard_rows(mesh: Mesh, arr, axis: int = 0):
    """Place an array with its leading axis sharded over 'dp'."""
    spec = [None] * arr.ndim
    spec[axis] = "dp"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))
