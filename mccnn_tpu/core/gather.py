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


ONEHOT_GATHER_MAX_ELEMS = 1 << 23  # (B*S*N) one-hot footprint bound


def onehot_gather(values: Array, idx: Array) -> Array:
    """Row gather expressed as a one-hot matmul: TPU row-gathers run at
    ~100 M elem/s on this chip (CLAUDE.md), while a (S, N) one-hot build plus
    an MXU contraction is ~10x faster at hierarchy scale (round-4 small-N
    item). The backward is the transposed matmul — a deterministic dense
    scatter, same story as the gather's scatter-add but MXU-shaped.

    values: (B, N, C); idx: (B, S) int32 -> (B, S, C).
    """
    n = values.shape[1]
    onehot = (
        idx[..., None] == jnp.arange(n, dtype=idx.dtype)[None, None, :]
    ).astype(values.dtype)  # (B, S, N)
    return jnp.einsum(
        "bsn,bnc->bsc", onehot, values,
        precision=jax.lax.Precision.HIGHEST,  # exact 0/1 selection of f32
    )


def gather_rows(values: Array, idx: Array) -> Array:
    """values: (B, N, C), idx: (B, S) -> (B, S, C), picking the faster of the
    one-hot-matmul and native-gather formulations by footprint."""
    B, S = idx.shape
    if B * S * values.shape[1] <= ONEHOT_GATHER_MAX_ELEMS:
        return onehot_gather(values, idx)
    return batched_gather(values, idx)


def masked_mean(x: Array, mask: Array, axis: int, eps: float = 1e-8) -> Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), eps)
