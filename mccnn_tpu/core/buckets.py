"""Dense cell-bucket layout — the TPU-native replacement for the reference's
cell-sorted CSR grid (``tf_ops/sort_gpu.*``; SURVEY §2.1).

Points are scattered into a regular grid of cells with edge = conv radius,
each cell holding up to ``cap`` point slots, with ONE GHOST CELL LAYER on
every side. The payoff: for any cell, the 27-cell neighborhood that bounds a
radius search is 9 *contiguous* runs of 3 cells in the z-major flattened
array, so a Pallas kernel can fetch all candidate points with 9 dense DMAs —
no per-point gather, no atomics, everything static-shaped (SURVEY §7).

Empty slots carry a far-away sentinel position so the kernel's distance test
eliminates them with zero branching; the ghost layer makes boundary cells
need no clamping (clamped windows would double-count cells).

Capacity overflow: points beyond ``cap`` in a cell are dropped from the
bucketed view (counted in ``overflow`` for diagnostics). Size ``cap`` to the
data — tests assert zero overflow for the shipped configurations.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

SENTINEL = 1.0e6


class BucketGrid(NamedTuple):
    """Bucketized view of a point set.

    Attributes:
      slot_of_point: ``(B, N)`` int32 — flat slot index of each input point
        (points dropped by overflow or masked out map to the trash slot, the
        last slot of the array).
      point_of_slot: ``(B, S)`` int32 — input point index per slot (0 where
        empty; check ``slot_mask``). ``S = Rp^3 * cap + 1`` (trash slot last).
      slot_mask: ``(B, S)`` bool — slot holds a real point.
      positions: ``(B, S, 3)`` — bucketed positions; empty slots hold
        ``sentinel`` (and the trash slot too).
      res: real cells per axis R (static). Padded axis = R + 2 (ghosts).
      cap: slots per cell (static, multiple of 8).
      radius: cell edge (the conv radius).
      overflow: ``(B,)`` int32 — points dropped due to cap overflow.
    """

    slot_of_point: Array
    point_of_slot: Array
    slot_mask: Array
    positions: Array
    res: int
    cap: int
    radius: float
    overflow: Array

    @property
    def padded_res(self) -> int:
        return self.res + 2

    @property
    def n_slots(self) -> int:  # excluding trash
        return self.padded_res**3 * self.cap


def res_for_radius(radius: float, max_res: int = 64) -> int:
    """Cells per axis; rounded UP to even so the kernel's 2x2x2 cell blocks
    tile the real grid exactly."""
    r = min(max(1, math.ceil(1.0 / radius)), max_res)
    return r + (r % 2)


def padded_cell_id(coords: Array, padded_res: int) -> Array:
    """z-major flat id of a REAL cell coordinate, shifted into the ghost grid."""
    c = coords + 1
    return (c[..., 0] * padded_res + c[..., 1]) * padded_res + c[..., 2]


def build_buckets(
    points: Array,
    mask: Array,
    radius: float,
    cap: int,
    *,
    sentinel: float = SENTINEL,
    max_res: int = 64,
) -> BucketGrid:
    """Bucketize ``(B, N, 3)`` points (unit cube) at cell edge ``radius``."""
    assert cap % 8 == 0, "cap must be a multiple of 8 (sublane alignment)"
    B, N, _ = points.shape
    R = res_for_radius(radius, max_res)
    Rp = R + 2
    n_slots = Rp**3 * cap
    trash = n_slots  # one extra slot swallowing overflow/masked points

    coords = jnp.clip(jnp.floor(points / radius).astype(jnp.int32), 0, R - 1)
    cid = padded_cell_id(coords, Rp)  # (B, N)

    def per_cloud(cid_b, mask_b, pts_b):
        # Rank of each point within its cell, in ascending point order:
        # stable-sort by cell id, then rank = position - first position of the
        # cell in the sorted order.
        big = jnp.int32(Rp**3)
        key = jnp.where(mask_b, cid_b, big)  # masked points sort last
        order = jnp.argsort(key, stable=True)
        sorted_key = key[order]
        first = jnp.searchsorted(sorted_key, sorted_key, side="left")
        rank_sorted = jnp.arange(N, dtype=jnp.int32) - first.astype(jnp.int32)
        rank = jnp.zeros((N,), jnp.int32).at[order].set(rank_sorted)

        ok = mask_b & (rank < cap)
        slot = jnp.where(ok, cid_b * cap + rank, trash)
        overflow = jnp.sum(mask_b & (rank >= cap)).astype(jnp.int32)

        point_of_slot = jnp.zeros((n_slots + 1,), jnp.int32).at[slot].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop"
        )
        slot_mask = jnp.zeros((n_slots + 1,), bool).at[slot].set(ok, mode="drop")
        slot_mask = slot_mask.at[trash].set(False)
        positions = jnp.where(
            slot_mask[:, None], pts_b[point_of_slot], jnp.float32(sentinel)
        )
        return slot, point_of_slot, slot_mask, positions, overflow

    slot_of_point, point_of_slot, slot_mask, positions, overflow = jax.vmap(per_cloud)(
        cid, mask, points
    )
    return BucketGrid(
        slot_of_point=slot_of_point,
        point_of_slot=point_of_slot,
        slot_mask=slot_mask,
        positions=positions,
        res=R,
        cap=cap,
        radius=float(radius),
        overflow=overflow,
    )


def bucketize(grid: BucketGrid, values: Array, fill: float = 0.0) -> Array:
    """Scatter per-point values ``(B, N, C)`` into slot order ``(B, S, C)``."""
    out = jax.vmap(lambda v, i: v[i])(values, grid.point_of_slot)
    extra = out.ndim - grid.slot_mask.ndim
    m = grid.slot_mask.reshape(grid.slot_mask.shape + (1,) * extra)
    return jnp.where(m, out, jnp.asarray(fill, out.dtype))


def unbucketize(grid: BucketGrid, slot_values: Array, mask: Array) -> Array:
    """Gather per-slot values back to point order ``(B, N, C)``; masked/dropped
    points read the trash slot (zeros written there by the kernel's mask)."""
    out = jax.vmap(lambda v, i: v[i])(slot_values, grid.slot_of_point)
    extra = out.ndim - mask.ndim
    m = mask.reshape(mask.shape + (1,) * extra)
    return jnp.where(m, out, 0)


def default_cap(n_points: int, radius: float, *, slack: float = 3.0) -> int:
    """Static cell capacity heuristic: mean occupancy x slack, rounded up to a
    multiple of 8. Clouds are usually 2D manifolds, so occupancy concentrates
    on the surface cells — slack covers that concentration; validate with
    ``BucketGrid.overflow`` on real data."""
    R = res_for_radius(radius)
    surface_cells = max(1, 4 * R * R)  # manifold-ish estimate
    mean_occ = n_points / surface_cells
    cap = int(math.ceil(mean_occ * slack)) + 8
    return min(max(8, (cap + 7) // 8 * 8), max(8, (n_points + 7) // 8 * 8))
