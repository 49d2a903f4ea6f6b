"""Multi-host SPMD runtime (SURVEY.md §2.4 "Distributed runtime / comms
backend" row): ``jax.distributed.initialize`` wiring so the same chain-sharded
programs span pod slices — collectives compiled by XLA over ICI within a
slice and DCN across slices; there is no explicit NCCL/MPI layer to write.

Environment-driven (the standard pod launch shape):

    GAPLAC_COORDINATOR=host:port   GAPLAC_NUM_PROCESSES=N   GAPLAC_PROCESS_ID=i

or explicit kwargs.  On TPU pods the three values are usually auto-detected
by JAX; this module only needs to be called once per process before any
computation (the mcmc CLI calls ``maybe_initialize()``).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

log = logging.getLogger("gaplac")

_initialized = False


def maybe_initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when configured; returns True if multi-host.

    No-op (returns False) when neither kwargs nor GAPLAC_COORDINATOR are set —
    single-process runs stay untouched.
    """
    global _initialized
    if _initialized:
        return True
    coordinator = coordinator or os.environ.get("GAPLAC_COORDINATOR")
    if coordinator is None:
        return False
    num_processes = num_processes or int(os.environ.get("GAPLAC_NUM_PROCESSES", "0")) or None
    process_id = (
        process_id
        if process_id is not None
        else (int(os.environ["GAPLAC_PROCESS_ID"]) if "GAPLAC_PROCESS_ID" in os.environ else None)
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    log.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def global_chain_mesh():
    """1-D "chains" mesh over ALL global devices (every host sees the same
    mesh; chain shards land on local devices)."""
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), axis_names=("chains",))
