"""Multi-host initialisation (DCN) helpers.

Within a slice, sharding rides ICI automatically (mesh axes over local
devices). Across hosts, JAX's distributed runtime must be initialised before
any device access; this wrapper reads the standard env configuration
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or TPU pod
metadata when present) and then meshes span all global devices, with XLA
routing inter-host collectives over DCN.

Usage (one call at program start on every host):

    from wise_tpu.parallel.distributed import maybe_initialize_distributed
    maybe_initialize_distributed()
    mesh = get_mesh(dp=-1)   # now spans all hosts' devices
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialise jax.distributed when multi-host env config is present.
    Returns True if running multi-host."""
    global _initialized
    if _initialized:
        return True
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = os.environ.get("JAX_NUM_PROCESSES")
    if coordinator and num_processes and int(num_processes) > 1:
        import jax

        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_processes),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
        _initialized = True
        logger.info(
            f"jax.distributed initialised: process "
            f"{os.environ.get('JAX_PROCESS_ID', '0')}/{num_processes}"
        )
        return True
    if os.environ.get("TPU_WORKER_HOSTNAMES"):
        # TPU pod: jax.distributed.initialize auto-detects from metadata
        import jax

        jax.distributed.initialize()
        _initialized = True
        return True
    return False
