"""Data parallelism over a device mesh.

The reference has NO distributed support at all (single process, single GPU,
TF1 feed_dict — SURVEY §2.3); this module is new TPU-native design, not a
port: shard the batch axis over the mesh with `jax.sharding`, `jit` the train
step with sharded in/out specs, and let XLA insert the gradient all-reduce
over ICI (SURVEY §5.8 — no hand-written communication backend).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; replicate everything else."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Device-put a host batch pytree with its leading axis sharded over the
    mesh. Leading dim must divide by mesh size (pad the batch first)."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
