"""Spatial sharding with halo exchange — scaling to huge scenes.

The reference handles large ScanNet scenes by chopping them into independent
CPU-side blocks (SURVEY §5.7), losing all cross-block context. TPU-native
redesign: shard the point set across devices as contiguous slabs along one
spatial axis and exchange a one-radius-wide HALO SHELL of boundary points
(and their features) with the two neighboring shards via
``jax.lax.ppermute`` inside ``shard_map`` — the point-cloud analog of ring
attention / context parallelism. Collectives ride ICI; every shape is static
(fixed halo capacity + masks).

After ``exchange_halos`` each shard holds ``local ∪ halo_left ∪ halo_right``
sources, so any radius-bounded op (neighbor search, KDE, MC conv) computed for
LOCAL query points is exactly equal to the unsharded computation — verified
against the single-device oracle in tests/test_spatial.py.

Usage inside ``shard_map`` over a 1-D mesh axis ``"x"`` (the exact two-phase
pattern — pdf first on its owner shard, then shipped with the conv halo;
see tests/test_spatial.py for the full oracle-checked version)::

    aug1 = exchange_halos(pts, mask, {}, lo, hi, radius, cap, "x")
    pdf = kde_density(aug1.points, aug1.mask, radius)[:n_local]
    aug = exchange_halos(pts, mask, {"f": f, "pdf": pdf}, lo, hi, radius, cap, "x")
    nbh = radius_neighbors(pts, mask, aug.points, aug.mask, radius, k)
    out = mc_conv(params, pts, nbh, aug.points, aug.values["f"], aug.values["pdf"])
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

# Plain float, NOT jnp.float32: a module-level jax array initializes the XLA
# backend at import time, which breaks jax.distributed.initialize on pods
# (it must run before any backend-initializing call).
_BIG = np.float32(1e9)


class HaloAugmented(NamedTuple):
    """Local points concatenated with received halo shells.

    points: ``(N + 2*cap, 3)``; mask: ``(N + 2*cap,)``;
    values: dict of per-point payloads, each ``(N + 2*cap, ...)``;
    overflow: scalar int32 — boundary-shell points this shard FAILED to ship
    because ``halo_cap`` was too small (any nonzero value means downstream
    results near boundaries are missing neighbors — enlarge the cap)."""

    points: Array
    mask: Array
    values: dict
    overflow: Array


def _compress(points: Array, sel: Array, payload: dict, cap: int):
    """Pack selected rows to the front, fixed capacity (mask overflow)."""
    n = points.shape[0]
    key = jnp.where(sel, jnp.arange(n, dtype=jnp.int32), n)
    order = jnp.argsort(key)[:cap]
    keep = jnp.take(key, order) < n
    idx = jnp.where(keep, order, 0)
    pts = jnp.where(keep[:, None], points[idx], _BIG)  # far sentinel
    vals = {
        k: jnp.where(
            keep.reshape((cap,) + (1,) * (v.ndim - 1)), v[idx], 0
        )
        for k, v in payload.items()
    }
    return pts, keep, vals


def exchange_halos(
    points: Array,
    mask: Array,
    values: dict,
    shard_lo: Array,
    shard_hi: Array,
    radius: float,
    halo_cap: int,
    axis_name: str,
    *,
    shard_axis: int = 0,
) -> HaloAugmented:
    """Exchange radius-wide boundary shells with both neighbor shards.

    Args:
      points: ``(N, 3)`` local shard points in GLOBAL coordinates.
      mask: ``(N,)`` validity.
      values: per-point payloads to ship with the halo (e.g. features, pdf).
      shard_lo / shard_hi: this shard's slab bounds along ``shard_axis``
        (scalars; e.g. from a global AABB divided by the axis size).
      radius: op support radius — the halo shell width.
      halo_cap: static capacity per halo direction (overflow is masked out —
        size to the data; tests assert no overflow).
      axis_name: the mesh axis to permute over.
    """
    coord = points[:, shard_axis]
    n_shards = jax.lax.axis_size(axis_name)

    send_hi = mask & (coord >= shard_hi - radius)  # goes to the right shard
    send_lo = mask & (coord <= shard_lo + radius)  # goes to the left shard
    overflow = jnp.maximum(send_hi.sum() - halo_cap, 0) + jnp.maximum(
        send_lo.sum() - halo_cap, 0
    )
    hi_pts, hi_mask, hi_vals = _compress(points, send_hi, values, halo_cap)
    lo_pts, lo_mask, lo_vals = _compress(points, send_lo, values, halo_cap)

    right = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    left = [(i, (i - 1) % n_shards) for i in range(n_shards)]

    def ship(x, perm):
        return jax.lax.ppermute(x, axis_name, perm)

    # What we receive from the LEFT neighbor is what it sent rightward.
    recv_left = jax.tree.map(lambda x: ship(x, right), (hi_pts, hi_mask, hi_vals))
    recv_right = jax.tree.map(lambda x: ship(x, left), (lo_pts, lo_mask, lo_vals))

    # Ring wrap-around: shard 0's "left neighbor" is the last shard — their
    # points are geometrically far, but mask them anyway for hygiene.
    idx = jax.lax.axis_index(axis_name)
    lmask = recv_left[1] & (idx > 0)
    rmask = recv_right[1] & (idx < n_shards - 1)

    points_aug = jnp.concatenate([points, recv_left[0], recv_right[0]])
    mask_aug = jnp.concatenate([mask, lmask, rmask])
    values_aug = {
        k: jnp.concatenate([values[k], recv_left[2][k], recv_right[2][k]])
        for k in values
    }
    return HaloAugmented(
        points=points_aug,
        mask=mask_aug,
        values=values_aug,
        overflow=overflow.astype(jnp.int32),
    )


def gather_level(
    points: Array,
    mask: Array,
    values: dict,
    cap: int,
    axis_name: str,
) -> HaloAugmented:
    """All-gather a (sparse) level over the mesh axis — the exact source set
    for ops whose radius exceeds one slab width, where a single halo exchange
    would miss sources two or more shards away (round-4 finding; see
    parallel/sharded_mcseg.py).

    Each shard compacts its masked rows to a static ``cap`` (overflow counted,
    not silent), all-gathers the compacted buffers, and masks out its OWN
    slice so the result can be concatenated after the local rows without
    double counting:

      points: ``(N + n_shards*cap, 3)`` = [local rows in slot order | gathered]
      mask:   local ``mask`` followed by the gathered validity (own slice off)

    Same contract as ``exchange_halos`` — rows ``[0:N]`` are the local points
    in their original slot order, so per-row results (KDE of local points,
    conv outputs at local queries) index the same way on either path.
    """
    pts_c, keep, vals_c = _compress(points, mask, values, cap)
    overflow = jnp.maximum(mask.sum() - cap, 0).astype(jnp.int32)

    g_pts, g_keep, g_vals = jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis_name),
        (pts_c, keep, vals_c),
    )
    n_shards = g_pts.shape[0]
    me = jax.lax.axis_index(axis_name)
    not_mine = jnp.arange(n_shards, dtype=jnp.int32) != me
    g_keep = g_keep & not_mine[:, None]

    points_aug = jnp.concatenate([points, g_pts.reshape(-1, 3)])
    mask_aug = jnp.concatenate([mask, g_keep.reshape(-1)])
    values_aug = {
        k: jnp.concatenate(
            [values[k], g_vals[k].reshape((-1,) + g_vals[k].shape[2:])]
        )
        for k in values
    }
    return HaloAugmented(
        points=points_aug, mask=mask_aug, values=values_aug, overflow=overflow
    )


def slab_bounds(
    n_shards: int, axis_name: str, lo: float = 0.0, hi: float = 1.0
):
    """Uniform slab bounds for a unit-cube scene: returns (shard_lo, shard_hi)
    for the calling shard (use inside shard_map)."""
    i = jax.lax.axis_index(axis_name).astype(jnp.float32)
    w = (hi - lo) / n_shards
    return lo + i * w, lo + (i + 1.0) * w


def shard_points_by_slab(
    points, mask, n_shards: int, cap: int, shard_axis: int = 0
):
    """Host-side helper: partition a global cloud into per-shard padded arrays
    ``(n_shards, cap, 3)`` by uniform slabs (for tests / data loading)."""
    import numpy as np

    points = np.asarray(points)
    mask = np.asarray(mask)
    coord = points[:, shard_axis]
    w = 1.0 / n_shards
    out_p = np.zeros((n_shards, cap, 3), np.float32)
    out_m = np.zeros((n_shards, cap), bool)
    out_idx = np.full((n_shards, cap), -1, np.int64)
    for s in range(n_shards):
        sel = np.nonzero(
            mask & (coord >= s * w) & (coord < (s + 1) * w + (1 if s == n_shards - 1 else 0))
        )[0]
        if len(sel) > cap:
            raise ValueError(f"shard {s} overflow: {len(sel)} > {cap}")
        out_p[s, : len(sel)] = points[sel]
        out_m[s, : len(sel)] = True
        out_idx[s, : len(sel)] = sel
    return out_p, out_m, out_idx
