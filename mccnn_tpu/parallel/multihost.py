"""Multi-host (DCN) data parallelism scaffolding.

The reference is strictly single-process (SURVEY §2.3); this is new
TPU-native design (SURVEY §5.8): ``jax.distributed.initialize`` for the
process group, a global mesh whose outer axis spans hosts (collectives cross
DCN) and whose inner axis spans each host's local chips (ICI), and
host-local batch feeding with ``jax.make_array_from_process_local_data``.

This environment has one host and one chip, so the multi-host path cannot be
executed here; the logic below is the standard JAX recipe, kept thin enough
to be exercised by the single-host degenerate case (tests) and used as-is on
a real pod slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX process group (no-op when single-process).

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly for CPU/GPU clusters."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def global_data_mesh(axis: str = "data") -> Mesh:
    """1-D data mesh over ALL devices of ALL processes; sharding the batch on
    it puts the gradient all-reduce on ICI within hosts and DCN across."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch_to_global(batch, mesh: Mesh, axis: str = "data"):
    """Assemble per-host batch shards into one global array pytree.

    Each process feeds its local slice of the global batch (global batch =
    local batch * process_count); jax assembles a sharded global array without
    ever materializing the whole batch on one host."""
    sharding = NamedSharding(mesh, P(axis))

    def convert(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(convert, batch)


def process_info() -> dict:
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
