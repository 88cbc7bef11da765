"""Pallas TPU kernels (the reference's CUDA op layer, redesigned — SURVEY §2.1)."""

from .dense_conv import dense_mc_conv
from .mcconv_kernel import bucket_mc_conv
from .tile_conv import (
    auto_tile_pairs,
    count_tile_pairs,
    count_tile_steps,
    tile_kde,
    tile_mc_conv,
)

__all__ = [
    "auto_tile_pairs",
    "bucket_mc_conv",
    "count_tile_pairs",
    "count_tile_steps",
    "dense_mc_conv",
    "tile_kde",
    "tile_mc_conv",
]
