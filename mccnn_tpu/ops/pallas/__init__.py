"""Pallas TPU kernels (the reference's CUDA op layer, redesigned — SURVEY §2.1)."""

from .dense_conv import dense_mc_conv
from .mcconv_kernel import bucket_mc_conv

__all__ = ["bucket_mc_conv", "dense_mc_conv"]
