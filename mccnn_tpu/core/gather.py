"""Batched gather helpers shared by the core ops.

``batched_gather(values (B, N, ...), idx (B, ...)) -> (B, ..., ...)`` — gather
along the point axis per batch element.  Reverse-mode AD of this gather is a
scatter-add, which is exactly the reference's ``GetSampledFeatures`` /
``SortFeaturesBack`` gradient story (SURVEY §2.1) — XLA derives it for free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def batched_gather(values: Array, idx: Array) -> Array:
    """values: (B, N, *F); idx: (B, *I) int -> (B, *I, *F)."""
    return jax.vmap(lambda v, i: v[i])(values, idx)


def masked_mean(x: Array, mask: Array, axis: int, eps: float = 1e-8) -> Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), eps)
