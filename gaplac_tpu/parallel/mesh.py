"""Device-mesh utilities: chain-level data parallelism.

The reference is single-process (SURVEY.md §2.4); here N chains are a leading
sharded axis.  ``vmap``-ed chain kernels become SPMD programs simply by
placing the chain axis on a 1-D mesh: XLA partitions every per-chain
computation and no cross-chain communication exists until diagnostics reduce
over the axis (psum over ICI).  Multi-host: ``jax.distributed.initialize``
makes the same code span hosts (chains ride DCN-free — fully independent).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("gaplac")


def chain_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over (up to) all local devices, axis name "chains"."""
    devs = np.asarray(jax.devices()[: n_devices or len(jax.devices())])
    return Mesh(devs, axis_names=("chains",))


def shard_chain_axis(*arrays, mesh: Optional[Mesh] = None):
    """Shard each array's leading (chain) axis over the mesh when it divides
    evenly; otherwise leave unsharded (single-device).  Returns arrays in the
    same order."""
    n = arrays[0].shape[0]
    mesh = mesh or chain_mesh()
    ndev = mesh.devices.size
    if ndev <= 1 or n % ndev != 0:
        if ndev > 1:
            log.warning(
                "chains (%d) not divisible by devices (%d); running UNSHARDED "
                "on one device — pick a chain count that is a multiple of %d",
                n, ndev, ndev,
            )
        return arrays if len(arrays) > 1 else arrays[0]
    sharding = NamedSharding(mesh, P("chains"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    log.info("sharded %d chains over %d devices", n, ndev)
    return out if len(out) > 1 else out[0]
