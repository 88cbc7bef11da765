"""Spatially-sharded segmentation over scenes too large for one device.

A complete (if compact) per-point feature extractor + classifier that runs
with the point set sharded into x-slabs across a mesh axis: every radius-
bounded op consumes halo-augmented sources (parallel/spatial.py), so the
result is EXACTLY equal to the unsharded computation (tests/test_spatial.py
pattern, extended to a multi-layer network here).

This is the building block the reference entirely lacks (it chops scenes into
independent CPU blocks and loses cross-block context — SURVEY §5.7); here the
context flows through ICI halos instead.

Design notes:
  * same-level convs only (flat network): hierarchy construction under
    spatial sharding (Poisson boundary reconciliation) is a later round.
  * pure-pytree parameters (no flax) so the whole thing drops directly into
    ``shard_map`` without init ceremony.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from ..core.mcconv import MCConvParams, init_mcconv_params, mc_conv
from ..core.neighbors import radius_neighbors
from ..core.pdf import kde_density
from .spatial import exchange_halos, slab_bounds


class ShardedSegParams(NamedTuple):
    conv1: MCConvParams  # full conv: c_in -> width
    mix1_w: Array
    mix1_b: Array
    conv2: MCConvParams  # depthwise at width
    mix2_w: Array
    mix2_b: Array
    head_w: Array
    head_b: Array


def init_sharded_seg(
    key: jax.Array, c_in: int, width: int, n_classes: int
) -> ShardedSegParams:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    he = jax.nn.initializers.he_normal()
    return ShardedSegParams(
        conv1=init_mcconv_params(k1, c_in, width),
        mix1_w=he(k2, (width, width)),
        mix1_b=jnp.zeros((width,)),
        conv2=init_mcconv_params(k3, width, None),
        mix2_w=he(k4, (width, width)),
        mix2_b=jnp.zeros((width,)),
        head_w=he(k5, (width, n_classes)),
        head_b=jnp.zeros((n_classes,)),
    )


def _layer_conv(params, pts, mask, aug, feats_aug, pdf_aug, radius, k, c_out):
    nbh = radius_neighbors(
        pts[None], mask[None], aug.points[None], aug.mask[None], radius, k
    )
    out = mc_conv(
        params, pts[None], nbh, aug.points[None], feats_aug[None], pdf_aug[None],
        c_out=c_out,
    )[0]
    return jnp.where(mask[:, None], out, 0.0)


def sharded_seg_apply(
    params: ShardedSegParams,
    points: Array,  # (N_shard, 3) GLOBAL coordinates, this shard's slab
    mask: Array,  # (N_shard,)
    features: Array,  # (N_shard, C)
    *,
    radius: float,
    halo_cap: int,
    axis_name: str,
    n_shards: int,
    neighbor_k: int = 32,
) -> Array:
    """Per-point logits for this shard; call inside shard_map over
    ``axis_name``. Exact vs the unsharded network (see tests)."""
    lo, hi = slab_bounds(n_shards, axis_name)

    # pdf on the owner shard (needs only a position halo), then shipped
    aug0 = exchange_halos(points, mask, {}, lo, hi, radius, halo_cap, axis_name)
    pdf = kde_density(aug0.points[None], aug0.mask[None], radius)[0]
    pdf_local = pdf[: points.shape[0]]

    def conv_block(feats, conv_params, c_out):
        aug = exchange_halos(
            points, mask, {"f": feats, "pdf": pdf_local}, lo, hi, radius,
            halo_cap, axis_name,
        )
        pdf_aug = jnp.maximum(aug.values["pdf"], 1e-12)
        return _layer_conv(
            conv_params, points, mask, aug, aug.values["f"], pdf_aug, radius,
            neighbor_k, c_out,
        )

    x = conv_block(features, params.conv1, params.mix1_w.shape[0])
    x = jax.nn.relu(x @ params.mix1_w + params.mix1_b)
    x = conv_block(x, params.conv2, None)
    x = jax.nn.relu(x @ params.mix2_w + params.mix2_b)
    logits = x @ params.head_w + params.head_b
    return jnp.where(mask[:, None], logits, 0.0)


def unsharded_seg_apply(
    params: ShardedSegParams,
    points: Array,  # (N, 3)
    mask: Array,
    features: Array,
    *,
    radius: float,
    neighbor_k: int = 32,
) -> Array:
    """Single-device oracle with identical math (for tests / small scenes)."""
    pdf = kde_density(points[None], mask[None], radius)[0]

    def conv_block(feats, conv_params, c_out):
        nbh = radius_neighbors(
            points[None], mask[None], points[None], mask[None], radius,
            neighbor_k,
        )
        out = mc_conv(
            conv_params, points[None], nbh, points[None], feats[None],
            pdf[None], c_out=c_out,
        )[0]
        return jnp.where(mask[:, None], out, 0.0)

    x = conv_block(features, params.conv1, params.mix1_w.shape[0])
    x = jax.nn.relu(x @ params.mix1_w + params.mix1_b)
    x = conv_block(x, params.conv2, None)
    x = jax.nn.relu(x @ params.mix2_w + params.mix2_b)
    logits = x @ params.head_w + params.head_b
    return jnp.where(mask[:, None], logits, 0.0)
