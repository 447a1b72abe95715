"""Device mesh utilities: the chain axis is the parallel axis.

The reference is a single-process, single-chain sampler (SURVEY §2d); the
TPU build scales by sharding *chains* over a 1-D device mesh.  Transition
kernels are elementwise over the chain axis, so XLA partitions the scan with
zero communication; collectives appear only in proposal-adaptation epochs
(pooled NF training, shared epsilon-quantiles — see ``sharded.py``).

Multi-host: call :func:`initialize_distributed` first (wraps
``jax.distributed.initialize``); ``make_mesh`` then spans all processes'
devices, with chains sharded across hosts over DCN and across chips over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "initialize_distributed",
    "make_mesh",
    "chain_sharding",
    "replicated_sharding",
    "shard_chains",
]

CHAIN_AXIS = "chains"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (no-op if already initialized or single
    process).  TPU pods auto-detect all arguments."""
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except RuntimeError:
        pass  # already initialized


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the chain axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (CHAIN_AXIS,))


def chain_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (chain) axis; replicate the rest."""
    return NamedSharding(mesh, P(CHAIN_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_chains(tree, mesh: Mesh):
    """Place every leaf of a batched carry with its chain axis sharded over
    the mesh.  Scalar leaves are replicated."""

    def put(x):
        x = jax.numpy.asarray(x)
        if x.ndim == 0:
            return jax.device_put(x, replicated_sharding(mesh))
        return jax.device_put(x, chain_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, tree)
