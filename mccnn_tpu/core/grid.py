"""Spatial bookkeeping: AABBs, normalization, regular-grid cell ids.

Reference parity (viscom-ulm/MCCNN): ``tf_ops/aabb_gpu.*`` (``ComputeAabb`` with
``scaleInv``) and the cell-id math inside ``tf_ops/sort_gpu.*``.  (Reference mount
was empty this session — see SURVEY.md header — so no file:line cites; parity
claims are vs. SURVEY.md §2.1.)

TPU-native redesign: instead of a CSR cell table built by a two-pass CUDA sort,
we keep the dense batched layout ``(B, N, 3)`` + a boolean validity mask and
compute *linear cell ids* per point.  Downstream consumers (the Poisson-disk
sampler's 27-coloring, the optional bucketed neighbor search) only need cell
coordinates / ids, which are pure vectorized arithmetic — no scatter, no
dynamic shapes, XLA-fusable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BIG = jnp.float32(1e9)


def compute_aabb(points: Array, mask: Array) -> tuple[Array, Array]:
    """Masked per-cloud axis-aligned bounding box.

    Args:
      points: ``(B, N, 3)`` float array.
      mask: ``(B, N)`` bool; False entries are padding and ignored.

    Returns:
      ``(aabb_min, aabb_max)``, each ``(B, 3)``.  Fully-masked clouds return a
      degenerate box at the origin.
    """
    m = mask[..., None]
    pmin = jnp.min(jnp.where(m, points, _BIG), axis=-2)
    pmax = jnp.max(jnp.where(m, points, -_BIG), axis=-2)
    any_valid = jnp.any(mask, axis=-1, keepdims=True)
    pmin = jnp.where(any_valid, pmin, 0.0)
    pmax = jnp.where(any_valid, pmax, 0.0)
    return pmin, pmax


def normalize_to_unit_cube(
    points: Array, mask: Array, *, scale_inv: bool = True, eps: float = 1e-12
) -> tuple[Array, Array, Array]:
    """Map each cloud into ``[0, 1]^3``.

    Mirrors the reference's ``scaleInv`` AABB option (SURVEY §2.1): with
    ``scale_inv=True`` all axes are divided by the single largest extent so the
    cloud keeps its aspect ratio and conv radii become scale-invariant
    (``relativeRadius`` semantics).  With ``scale_inv=False`` each axis is
    normalized independently (anisotropic stretch to the full cube).

    Returns:
      ``(normalized_points, aabb_min, scale)`` with ``scale`` shaped ``(B, 3)``;
      ``normalized = (points - aabb_min) / scale``.
    """
    aabb_min, aabb_max = compute_aabb(points, mask)
    extent = aabb_max - aabb_min
    if scale_inv:
        scale = jnp.max(extent, axis=-1, keepdims=True)
        scale = jnp.broadcast_to(scale, extent.shape)
    else:
        scale = extent
    scale = jnp.maximum(scale, eps)
    normalized = (points - aabb_min[..., None, :]) / scale[..., None, :]
    normalized = jnp.where(mask[..., None], normalized, 0.0)
    return normalized, aabb_min, scale


def cell_coords(points: Array, cell_size: float, grid_res: int) -> Array:
    """Integer 3D cell coordinates for points assumed to lie in ``[0, 1]^3``.

    ``grid_res`` must be a static Python int (XLA static shapes); coordinates
    are clipped into ``[0, grid_res)`` so slightly-out-of-box points (padding,
    float slop) stay addressable.
    """
    c = jnp.floor(points / cell_size).astype(jnp.int32)
    return jnp.clip(c, 0, grid_res - 1)


def linear_cell_ids(coords: Array, grid_res: int) -> Array:
    """Row-major linear cell id from integer ``(..., 3)`` cell coords."""
    return (coords[..., 0] * grid_res + coords[..., 1]) * grid_res + coords[..., 2]


def cell_color27(coords: Array) -> Array:
    """27-coloring of grid cells: ``(cx%3, cy%3, cz%3)`` → color in ``[0, 27)``.

    Cells of equal color are ≥ 2 cells apart along every differing axis-triple,
    which is the independence property the Poisson-disk sampler relies on
    (see core/sampling.py).
    """
    m = coords % 3
    return (m[..., 0] * 3 + m[..., 1]) * 3 + m[..., 2]


def grid_res_for_radius(radius: float, cell_scale: float = 1.0, max_res: int = 512) -> int:
    """Static grid resolution covering the unit cube with cells of edge
    ``radius * cell_scale`` (e.g. ``cell_scale=1/sqrt(3)`` for the sampler)."""
    import math

    res = max(1, math.ceil(1.0 / (radius * cell_scale)))
    return min(res, max_res)
