"""Parallelism: data-parallel sharding over device meshes (new TPU-native
design; the reference is single-GPU — SURVEY §2.3/§5.8)."""

from .dp import batch_sharding, make_mesh, replicate, replicated, shard_batch
from .multihost import (
    global_data_mesh,
    host_local_batch_to_global,
    initialize_distributed,
    process_info,
)
from .spatial import HaloAugmented, exchange_halos, slab_bounds

__all__ = [
    "HaloAugmented",
    "batch_sharding",
    "exchange_halos",
    "global_data_mesh",
    "host_local_batch_to_global",
    "initialize_distributed",
    "make_mesh",
    "process_info",
    "replicate",
    "replicated",
    "shard_batch",
    "slab_bounds",
]
