"""Parallelism: data-parallel sharding over device meshes (new TPU-native
design; the reference is single-GPU — SURVEY §2.3/§5.8)."""

from .dp import batch_sharding, make_mesh, replicate, replicated, shard_batch

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated",
    "shard_batch",
]
