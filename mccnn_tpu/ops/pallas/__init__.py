"""Pallas TPU kernels (the reference's CUDA op layer, redesigned — SURVEY §2.1)."""

from .mcconv_kernel import bucket_mc_conv

__all__ = ["bucket_mc_conv"]
