"""Poisson-disk sampling for point-hierarchy construction.

Reference parity (viscom-ulm/MCCNN): ``tf_ops/poisson_sampling.*``
(``PoissonSampling`` + ``GetSampledFeatures``) — a CUDA kernel that walks grid
cells in a serialized coloring pattern and greedily keeps points at pairwise
distance >= r (SURVEY §2.1/§3.2; mount empty, no file:line).

TPU-native redesign — a *maximal* Poisson-disk selection in exactly 27 fully
vectorized steps, no per-point serial loop:

  1. Cells of edge ``c = r / sqrt(3)`` (unit-cube grid, static resolution):
     any two points in the SAME cell are < r apart (cell diagonal == r), so at
     most one point per cell can ever be selected.
  2. 27-coloring ``(cx%3, cy%3, cz%3)``: two distinct same-color cells are >= 2
     cells apart on some axis, i.e. their closest faces are >= 2c = 2r/sqrt(3)
     > r apart — candidates in distinct same-color cells can NEVER conflict.
  3. Loop over the 27 colors (``lax.fori_loop``, static trip count). For the
     current color, each cell's candidate is its minimum-index *uncovered*
     point ("covered" = within r of an already-selected point, tracked via the
     precomputed self-neighborhood).  All candidates of the color are accepted
     simultaneously — same-cell conflicts are impossible (one candidate), and
     same-color cross-cell conflicts are impossible by (2); conflicts against
     earlier selections are impossible because candidates are uncovered.
  4. After the single 27-color sweep the selection is MAXIMAL: when a cell's
     color comes up, if it still holds an uncovered point, its min-index
     uncovered point is selected and then covers the whole cell (diameter r).

The result is deterministic (min-index tie-break), pairwise >= r apart, and
every input point is within r of a selected point — the same invariants as the
reference's greedy, though not the same subset (accuracy parity, not bit
parity, across this boundary; SURVEY §7 "hard parts").

Caveat: "covered" is read from a K-capacity truncated neighbor list; if more
than K points fall within r of a point, coverage can be under-reported and a
min-distance violation becomes possible in pathological density. Size K to the
data (tests sweep this).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from .gather import batched_gather
from .grid import cell_color27, cell_coords, grid_res_for_radius, linear_cell_ids
from .neighbors import Neighborhood, self_neighbors

_SQRT3 = 3.0**0.5
_BIG_I32 = jnp.int32(2**30)


class SampleSet(NamedTuple):
    """Result of Poisson-disk sampling: a padded subset of the input points.

    Attributes:
      idx: ``(B, S)`` int32 indices into the input point axis (clipped valid).
      mask: ``(B, S)`` bool — True for real selections.
      selected: ``(B, N)`` bool — dense selection flags over the inputs.
      overflow: ``(B,)`` int32 dropped tile-pair count (tile-sweep path only;
        None elsewhere). Nonzero means coverage queries missed pairs and the
        min-distance invariant may be violated — surface it (models sow it
        into 'diagnostics'; the train loop hard-errors).
    """

    idx: Array
    mask: Array
    selected: Array
    overflow: Array | None = None


DENSE_SAMPLER_MAX_N = 4096  # dense O(N^2) ceiling (the capacity-free fallback)
# Above this the tile cover-sweep beats the dense sampler WHEN the caller has
# a tile capacity (on-chip A/B 2026-08-20, docs/ROOFLINE.md: at N=4096 tiles
# win 7.7 vs 12.9 ms B=8 and 1.02 vs 1.18 ms B=1; at N=2048 dense wins 2.1 vs
# 4.4 ms — the crossover sits between).
TILE_SAMPLER_MIN_N = 2048


def poisson_disk(
    points: Array,
    mask: Array,
    radius: float,
    max_samples: int,
    *,
    neighborhood: Neighborhood | None = None,
    k: int = 48,
    tile_pairs: int | None = None,
    max_steps: int | None = None,
    interpret: bool = False,
) -> SampleSet:
    """Maximal Poisson-disk subset with min pairwise distance ``radius``.

    Args:
      points: ``(B, N, 3)`` in the unit cube (normalize first; see grid.py).
      mask: ``(B, N)`` validity.
      radius: Poisson-disk radius (static float).
      max_samples: static output capacity ``S``; selections beyond it are
        dropped in index order (size it generously — tests check occupancy).
      neighborhood: optional precomputed self-neighborhood at ``radius``
        (only used by the large-N neighbor-list fallback).
      k: capacity for the self-neighborhood when computed here.
      tile_pairs: static z-order tile-pair capacity — routes the large-N case
        to the EXACT tile-sweep formulation (ops/pallas/tile_conv.py cover
        sweeps; no K truncation, no per-step gathers). The big-scene default
        when the caller has a capacity (see api/hierarchy.py).
      interpret: run the tile sweeps in interpret mode (tests).

    Four implementations of the same 27-color algorithm:
      * N <= 1024 on TPU: fully fused on-chip sweep kernel.
      * N > TILE_SAMPLER_MIN_N with ``tile_pairs``: Hilbert-tile cover
        sweeps (exact; beats dense above ~2k, on-chip A/B r5).
      * N <= DENSE_SAMPLER_MAX_N otherwise: dense (B, N, N) adjacency
        masked-reduce — no gathers, no segment ops; on TPU each color step
        is a couple of fused VPU passes (~200x faster than gathers).
      * larger N without a capacity: neighbor-list formulation (K-capacity
        gathers per step; coverage can be under-reported past K).
    """
    B, N, _ = points.shape

    cell_edge = float(radius) / _SQRT3
    res = grid_res_for_radius(radius, cell_scale=1.0 / _SQRT3)
    coords = cell_coords(points, cell_edge, res)  # (B, N, 3)
    cids = linear_cell_ids(coords, res)  # (B, N)
    colors = cell_color27(coords)  # (B, N)
    n_cells = res * res * res

    point_index = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))

    overflow = None
    if N <= 1024 and jax.default_backend() == "tpu":
        # fully fused on-chip sweep (ops/pallas/poisson_kernel.py)
        from ..ops.pallas.poisson_kernel import poisson_sweep_pallas

        selected = poisson_sweep_pallas(points, mask, cids, colors, radius)
    elif tile_pairs is not None and N > TILE_SAMPLER_MIN_N:
        selected, overflow = _poisson_tiles(
            points, mask, coords, cids, colors, radius, res, tile_pairs,
            interpret, max_steps=max_steps,
        )
    elif N <= DENSE_SAMPLER_MAX_N:
        selected = _poisson_dense(points, mask, cids, colors, radius)
    else:
        if neighborhood is None:
            neighborhood = self_neighbors(points, mask, radius, k)
        selected = _poisson_neighbor_lists(
            cids, colors, mask, neighborhood, n_cells, N
        )

    selected = selected & mask

    # Compact selected flags into (B, S) indices, ascending index order.
    sort_key = jnp.where(selected, point_index, _BIG_I32)
    order = jnp.argsort(sort_key, axis=-1)[:, :max_samples].astype(jnp.int32)
    out_mask = jnp.take_along_axis(sort_key, order, axis=-1) < _BIG_I32
    idx = jnp.where(out_mask, order, 0)
    return SampleSet(idx=idx, mask=out_mask, selected=selected, overflow=overflow)


def _poisson_dense(points, mask, cids, colors, radius):
    """Dense-adjacency 27-color sweep (no gathers; VPU masked reduces).

    Precomputes once:
      adj[b, j, i]  — i is within ``radius`` of j (valid i only);
      pred[b, j, i] — i shares j's cell and has a smaller index (valid only).
    Per color step, entirely elementwise + last-axis reduces:
      cand_j = uncovered_j & (no uncovered predecessor) & color match
      covered_j |= any_i(adj[j, i] & cand_i)
    """
    B, N, _ = points.shape
    qq = jnp.sum(points * points, axis=-1)
    cross = jnp.einsum(
        "bnd,bmd->bnm", points, points, precision=jax.lax.Precision.HIGHEST
    )
    d2 = qq[:, :, None] + qq[:, None, :] - 2.0 * cross
    adj = (d2 <= radius * radius) & mask[:, None, :]  # (B, N, N)
    idx = jnp.arange(N, dtype=jnp.int32)
    pred = (
        (cids[:, :, None] == cids[:, None, :])
        & (idx[None, None, :] < idx[None, :, None])
        & mask[:, None, :]
    )

    def body(c, state):
        selected, covered = state
        uncovered = mask & ~covered
        blocked = jnp.any(pred & uncovered[:, None, :], axis=-1)
        cand = uncovered & ~blocked & (colors == c)
        selected = selected | cand
        covered = covered | jnp.any(adj & cand[:, None, :], axis=-1)
        return selected, covered

    selected, _ = jax.lax.fori_loop(
        0, 27, body, (jnp.zeros((B, N), bool), jnp.zeros((B, N), bool))
    )
    return selected


def _cell_hilbert_order(coords, mask, res):
    """Stable point order by the Hilbert index of each point's SAMPLER CELL
    (bijective on cells; ties broken by original index) — every cell becomes
    one contiguous run in ascending original-index order."""
    from ..ops.pallas.tile_conv import hilbert_code

    bits = max(1, (res - 1).bit_length())
    assert bits * 3 <= 30, f"sampler cell grid too fine: res={res}"
    code = hilbert_code(
        jnp.clip(coords, 0, (1 << bits) - 1).astype(jnp.int32), bits
    )
    code = jnp.where(mask, code, _BIG_I32)
    return jnp.argsort(code, axis=-1, stable=True).astype(jnp.int32)


def count_poisson_sweep_steps(points, mask, radius):
    """Per-cloud chunked-step demand of the big-scene tile sampler's cover
    sweeps on these inputs — the exact lossless value for
    ``poisson_disk(..., max_steps=)``. Mirrors ``_poisson_tiles``'s tile
    layout exactly (cell-Hilbert order, cover chunk size). Call on concrete
    data outside jit."""
    from ..ops.pallas.tile_conv import (
        DEFAULT_COVER_CHUNK,
        DEFAULT_TILE,
        _needed_steps,
        _refined_adjacency,
        _sorted_tiles,
        tile_minor,
    )

    cell_edge = float(radius) / _SQRT3
    res = grid_res_for_radius(radius, cell_scale=1.0 / _SQRT3)
    coords = cell_coords(points, cell_edge, res)
    order = _cell_hilbert_order(coords, mask, res)
    N, T = points.shape[1], DEFAULT_TILE
    Tm = tile_minor(T)
    nt, nt_m = -(-N // T), -(-N // Tm)
    rows, _, mn, mx = _sorted_tiles(points, mask, order, T, nt * T)
    if Tm == T:
        rows_m, mn_m, mx_m = rows, mn, mx
    else:
        rows_m, _, mn_m, mx_m = _sorted_tiles(points, mask, order, Tm, nt_m * Tm)
    adj = _refined_adjacency(rows, mn, mx, rows_m, mn_m, mx_m, T, radius, Tm)
    return _needed_steps(adj, DEFAULT_COVER_CHUNK * (T // Tm))


def _poisson_tiles(
    points, mask, coords, cids, colors, radius, res, tile_pairs, interpret,
    max_steps=None,
):
    """Cell-run tile 27-color sweep — the big-scene sampler (round-3 item:
    hierarchy construction on the conv's tile machinery, SURVEY §3.2).

    EXACT coverage: the per-color "newly covered" query (any in-radius
    selected candidate?) runs as an AABB-pruned space-filling-curve tile
    sweep (ops/pallas/tile_conv.py ``TileCoverSweep``) instead of reading a
    K-capacity truncated neighbor list — eliminating both the
    ``self_neighbors`` build (the 32k-scene bottleneck: a radius search this
    sampler was the only consumer of) and the 27 rounds of
    ``selected[nbr_idx]`` gathers (~100 M elem/s on this chip).

    Points are sorted by the Hilbert index of their SAMPLER CELL (bijective
    on cells; stable argsort tie-breaks by original index), so every cell is
    one contiguous run in ascending original-index order. The per-color
    "min-index uncovered point per cell" then needs NO segment_min and NO
    gather: it is "first uncovered point of its run", a cumsum + cummax
    segmented-prefix query — all elementwise in the SORTED domain; one
    unsort at the end."""
    from ..ops.pallas.tile_conv import make_cover_sweep

    B, N, _ = points.shape
    interpret = interpret or jax.default_backend() != "tpu"
    order = _cell_hilbert_order(coords, mask, res)
    sweep = make_cover_sweep(
        points, mask, radius, max_pairs=tile_pairs, order=order,
        max_steps=max_steps, interpret=interpret,
    )
    nt_rows = sweep.valid.shape[1]  # nt * T

    def sort1(x, fill):
        s = jnp.take_along_axis(x, order, axis=1)
        return jnp.pad(s, ((0, 0), (0, nt_rows - N)), constant_values=fill)

    s_cids = sort1(cids, -1)  # padding joins no real run
    s_colors = sort1(colors, -1)  # padding matches no color
    s_mask = sweep.valid
    seg_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), s_cids[:, 1:] != s_cids[:, :-1]], axis=1
    )

    def body(c, state):
        selected, covered = state
        uncovered = s_mask & ~covered
        u = uncovered.astype(jnp.int32)
        excl = jnp.cumsum(u, axis=1) - u  # uncovered strictly before i
        # excl at the latest run start <= i: excl is non-decreasing, so the
        # running max over run starts is exactly the current run's base.
        base = jax.lax.cummax(jnp.where(seg_start, excl, -1), axis=1)
        cand = uncovered & (excl == base) & (s_colors == c)
        cov = sweep.counts(cand.astype(jnp.float32))
        return selected | cand, covered | (cov > 0.0)

    zeros = jnp.zeros((B, nt_rows), bool)
    selected_sorted, _ = jax.lax.fori_loop(0, 27, body, (zeros, zeros))

    def unsort(o, s):
        return jnp.zeros((N,), bool).at[o[:N]].set(s[:N])

    selected = jax.vmap(unsort)(order, selected_sorted)
    return selected, sweep.overflow


def _poisson_neighbor_lists(cids, colors, mask, neighborhood, n_cells, N):
    """K-capacity neighbor-list formulation (large N; per-step gathers)."""

    def per_cloud(cid, color, pmask, nbr_idx, nbr_mask):
        def body(c, state):
            selected, covered = state
            uncovered = pmask & ~covered
            # Min uncovered index per cell (segment_min over dense cell table).
            key = jnp.where(uncovered, jnp.arange(N, dtype=jnp.int32), _BIG_I32)
            cell_min = jax.ops.segment_min(
                key, cid, num_segments=n_cells, indices_are_sorted=False
            )
            is_cell_min = key == cell_min[cid]
            cand = uncovered & is_cell_min & (color == c) & (key < _BIG_I32)
            selected = selected | cand
            # Newly covered: any neighbor (incl. self) selected.
            nbr_sel = jnp.where(nbr_mask, selected[nbr_idx], False)
            covered = covered | jnp.any(nbr_sel, axis=-1)
            return selected, covered

        selected, _ = jax.lax.fori_loop(
            0,
            27,
            body,
            (jnp.zeros((N,), bool), jnp.zeros((N,), bool)),
        )
        return selected

    return jax.vmap(per_cloud)(
        cids, colors, mask, neighborhood.idx, neighborhood.mask
    )


def gather_sampled(values: Array, samples: SampleSet) -> Array:
    """Gather per-point values (features/points) for a sampled subset.

    Reference parity: ``GetSampledFeatures`` (+ its registered gradient, which
    is the scatter-add XLA derives automatically for this gather).
    """
    from .gather import gather_rows

    out = (
        gather_rows(values, samples.idx)
        if values.ndim == 3
        else batched_gather(values, samples.idx)
    )
    extra_dims = out.ndim - samples.mask.ndim
    m = samples.mask.reshape(samples.mask.shape + (1,) * extra_dims)
    return jnp.where(m, out, 0)
