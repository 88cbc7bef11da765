"""Poisson-disk sampling under spatial sharding.

Completes the sharded-hierarchy story: each shard runs the dense 27-color
sweep on its own slab (core/sampling.py), then boundary conflicts are
reconciled with a one-directional priority rule — a shard defers to its LEFT
neighbor's boundary selections (received via the halo machinery) and drops
any of its own selections within the Poisson radius of them.

Guarantees (for slab width >= 2 * radius and adequate halo capacity):
  * min-distance: EXACT — a kept right-side selection within r of a kept
    left-side boundary selection is impossible by construction, and left-side
    boundary selections are never dropped by their own left neighbor (a point
    cannot sit in both boundary zones when slabs are >= 2r wide).
  * maximality: approximate near boundaries — points covered only by a
    dropped selection may end up within 2r (instead of r) of the nearest
    kept sample. Interior behavior is identical to the single-device sampler.

Verified against these invariants on the multi-device mesh in
tests/test_spatial.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..core.grid import cell_color27, cell_coords, grid_res_for_radius, linear_cell_ids
from ..core.sampling import _SQRT3, _poisson_dense
from .spatial import exchange_halos

_BIG = jnp.float32(1e9)


def sharded_poisson_disk(
    points: Array,  # (N_shard, 3) GLOBAL coordinates
    mask: Array,  # (N_shard,)
    radius: float,
    shard_lo: Array,
    shard_hi: Array,
    halo_cap: int,
    axis_name: str,
    *,
    shard_axis: int = 0,
) -> tuple[Array, Array]:
    """Per-shard Poisson-disk selection flags with boundary reconciliation.

    Call inside ``shard_map``; returns ``(selection, overflow)`` where
    ``selection`` is a (N_shard,) bool mask and ``overflow`` is the halo
    overflow count from ``exchange_halos`` — any nonzero value means
    left-neighbor boundary selections were dropped from the conflict check
    and the EXACT min-distance guarantee no longer holds (enlarge
    ``halo_cap``). Callers must check it (ADVICE r1)."""
    # 1. local maximal selection — scenes live in the unit cube (like the
    #    rest of the framework), so the global cell grid indexes directly
    cell_edge = float(radius) / _SQRT3
    res = grid_res_for_radius(radius, cell_scale=1.0 / _SQRT3)
    coords = cell_coords(points, cell_edge, res)
    cids = linear_cell_ids(coords, res)
    colors = cell_color27(coords)
    selected = _poisson_dense(
        points[None], mask[None], cids[None], colors[None], radius
    )[0]

    # 2. ship boundary-zone points + their selection flags to both neighbors
    aug = exchange_halos(
        points,
        mask,
        {"sel": selected},
        shard_lo,
        shard_hi,
        radius,
        halo_cap,
        axis_name,
        shard_axis=shard_axis,
    )
    n = points.shape[0]
    # halo layout: [local | from-left | from-right]; we defer ONLY to the
    # left neighbor (one-directional priority keeps the rule acyclic)
    left_pts = aug.points[n : n + halo_cap]
    left_sel = aug.values["sel"][n : n + halo_cap] & aug.mask[n : n + halo_cap]

    d2 = jnp.sum((points[:, None, :] - left_pts[None, :, :]) ** 2, axis=-1)
    conflict = jnp.any(
        (d2 <= radius * radius) & left_sel[None, :], axis=-1
    )
    return selected & ~conflict & mask, aug.overflow
