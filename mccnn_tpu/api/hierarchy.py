"""Multi-level point hierarchy built by Poisson-disk sampling.

Reference parity (viscom-ulm/MCCNN): ``utils/MCConvBuilder.py::PointHierarchy``
(SURVEY §2.2/§3.2) — level 0 is the input cloud; each further level is a
Poisson-disk subset at an increasing radius (AABB → cell sort → Poisson sample
→ gather features in the reference; here the sampler consumes the normalized
cloud directly).

TPU-native redesign: the hierarchy is an explicit immutable pytree with
**static per-level capacities** (padded + masked) instead of data-dependent
level sizes, so the whole network traces once under ``jit``.  Input features
are NOT stored in the hierarchy (the reference gathers them level-by-level);
models gather features along ``levels[l].sample`` when they need them — the
reference's implicit data flow made visible (SURVEY §7 design pivot 5).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax.numpy as jnp
from jax import Array

from ..core.gather import gather_rows
from ..core.neighbors import Neighborhood, self_neighbors
from ..core.sampling import DENSE_SAMPLER_MAX_N, SampleSet, poisson_disk

GLOBAL_RADIUS = math.sqrt(3.0) + 0.1  # covers the whole unit cube


class HierarchyLevel(NamedTuple):
    """One hierarchy level: padded points + mask, and how it was sampled.

    ``sample`` holds indices into the PREVIOUS level (None for level 0).
    ``self_nbh`` is the level's own-radius neighborhood (used by the sampler
    and reusable for same-level convs at that radius; may be None).
    """

    points: Array  # (B, N_l, 3)
    mask: Array  # (B, N_l)
    radius: float  # Poisson radius used to build this level (0.0 for level 0)
    sample: SampleSet | None
    self_nbh: Neighborhood | None


class PointHierarchy(NamedTuple):
    levels: tuple[HierarchyLevel, ...]

    def __len__(self) -> int:
        return len(self.levels)


def default_level_caps(n_points: int, radii: Sequence[float]) -> list[int]:
    """Static per-level capacities: a Poisson-disk set at radius r in the unit
    cube holds at most ~(sqrt(3)/r)^3 points (one per sampler cell); clouds are
    usually 2D manifolds, so (2/r)^2-ish is the practical bound. We take the
    min of both bounds and the parent capacity, rounded up to a multiple of 8."""
    caps = []
    n_prev = n_points
    for r in radii:
        vol = (math.sqrt(3.0) / max(r, 1e-6)) ** 3
        surf = (2.2 / max(r, 1e-6)) ** 2
        cap = min(n_prev, int(min(vol, surf)) + 8)
        cap = max(8, (cap + 7) // 8 * 8)
        caps.append(cap)
        n_prev = cap
    return caps


def hierarchy_from_masks(
    points: Array,
    level_masks: Sequence[Array],
    radii: Sequence[float],
) -> PointHierarchy:
    """Nested-mask view of a hierarchy: every level keeps the FULL point array
    with its own validity mask (no compaction).

    All ops are mask-aware, so this is computationally equivalent to the
    compacted representation ``build_hierarchy`` produces. It exists for
    interop with the spatially-sharded trainer (parallel/sharded_mcseg.py),
    whose levels are nested masks over the shard's slots: gathering its masks
    to global order and wrapping them here lets the flax ``MCSeg`` run on the
    exact same hierarchy (the block/spatial parity tests do this).

    ``level_masks[0]`` is the input validity mask; ``level_masks[l]`` for
    ``l >= 1`` selects the level-l subset (must be nested; ``radii[l-1]`` is
    its Poisson radius).
    """
    assert len(level_masks) == len(radii) + 1
    levels = [
        HierarchyLevel(
            points=points, mask=level_masks[0], radius=0.0, sample=None,
            self_nbh=None,
        )
    ]
    for r, m in zip(radii, level_masks[1:]):
        levels.append(
            HierarchyLevel(
                points=points, mask=m, radius=float(r), sample=None,
                self_nbh=None,
            )
        )
    return PointHierarchy(levels=tuple(levels))


def build_hierarchy(
    points: Array,
    mask: Array,
    radii: Sequence[float],
    *,
    level_caps: Sequence[int] | None = None,
    neighbor_k: int = 48,
    global_level: bool = False,
    tile_pairs: int | None = None,
    tile_steps: dict | None = None,
) -> PointHierarchy:
    """Build the Poisson-disk hierarchy. ``points`` must be normalized to the
    unit cube (see ``core.grid.normalize_to_unit_cube``).

    Args:
      radii: Poisson-disk radius per new level (ascending, like the reference).
      level_caps: static capacity per new level (default: heuristic bound).
      neighbor_k: self-neighborhood capacity used by the sampler.
      global_level: append a 1-point level at the masked centroid (the
        reference's "global" pooling level for classification heads).
      tile_pairs: static z-order tile-pair capacity — big levels sample via
        the EXACT Morton-tile sweep (no self-neighborhood build, no gathers;
        core/sampling.py ``_poisson_tiles``). Sized for conv sites at level
        0 (a conv-radius capacity upper-bounds the smaller Poisson radius).
      tile_steps: optional measured per-site step budgets (keys
        ``("sweep", source_level, round(radius, 6))`` — see
        ``tasks.common.auto_tile_steps``); sites absent keep the worst-case
        budget derived from ``tile_pairs``.
    """
    if level_caps is None:
        level_caps = default_level_caps(points.shape[1], radii)
    levels = [
        HierarchyLevel(points=points, mask=mask, radius=0.0, sample=None, self_nbh=None)
    ]
    cur_pts, cur_mask = points, mask
    for lvl, (r, cap) in enumerate(zip(radii, level_caps)):
        # The dense sampler path needs no neighbor lists; only build them for
        # large levels (they also get cached on the level for reuse) — and
        # not even there when the tile sampler takes the level.
        nbh = None
        if cur_pts.shape[1] > DENSE_SAMPLER_MAX_N and tile_pairs is None:
            nbh = self_neighbors(cur_pts, cur_mask, r, neighbor_k)
        max_steps = None
        if tile_steps:
            max_steps = tile_steps.get(("sweep", lvl, round(float(r), 6)))
        ss = poisson_disk(
            cur_pts, cur_mask, r, cap, neighborhood=nbh,
            tile_pairs=tile_pairs, max_steps=max_steps,
        )
        nxt_pts = jnp.where(
            ss.mask[..., None], gather_rows(cur_pts, ss.idx), 0.0
        )
        levels[-1] = levels[-1]._replace(self_nbh=nbh)
        levels.append(
            HierarchyLevel(
                points=nxt_pts, mask=ss.mask, radius=float(r), sample=ss, self_nbh=None
            )
        )
        cur_pts, cur_mask = nxt_pts, ss.mask
    if global_level:
        m = cur_mask[..., None].astype(cur_pts.dtype)
        denom = jnp.maximum(m.sum(axis=1), 1.0)
        centroid = (cur_pts * m).sum(axis=1, keepdims=True) / denom[:, None, :]
        any_valid = jnp.any(cur_mask, axis=-1, keepdims=True)
        levels.append(
            HierarchyLevel(
                points=centroid,
                mask=any_valid,
                radius=GLOBAL_RADIUS,
                sample=None,
                self_nbh=None,
            )
        )
    return PointHierarchy(levels=tuple(levels))
