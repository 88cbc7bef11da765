"""Convolution builder: cached spatial queries between hierarchy levels.

Reference parity (viscom-ulm/MCCNN): ``utils/MCConvBuilder.py::ConvolutionBuilder``
(SURVEY §2.2/§3.3) — ``create_convolution`` computes ``find_neighbors`` +
``compute_pdf`` lazily and caches them keyed by (hierarchy, inLevel, outLevel,
radius) so stacked convs reuse the spatial queries.

TPU-native redesign: the cache is an explicit trace-time Python dict on a
plain object (everything it stores is a traced pytree that XLA CSEs anyway —
the cache mainly keeps the traced graph small and compile times down). The
conv itself lives in ``models/layers.py`` (a flax module owning the kernel-MLP
parameters); this object only answers spatial queries."""

from __future__ import annotations

from dataclasses import dataclass, field

from jax import Array

from ..core.buckets import BucketGrid, build_buckets, default_cap
from ..core.neighbors import Neighborhood, radius_neighbors
from ..core.pdf import kde_density
from .hierarchy import PointHierarchy


@dataclass
class SpatialCache:
    """Trace-time cache of neighborhoods and KDE pdfs between levels.

    Mirrors the reference's cache semantics: one entry per
    ``(in_level, out_level, radius)`` for neighborhoods and per
    ``(level, radius)`` for pdfs (the pdf depends only on the SOURCE level and
    the bandwidth, reference §3.3).
    """

    hierarchy: PointHierarchy
    neighbor_k: int = 32
    kde_window: float = 0.25
    pdf_neighbor_k: int = 32
    bucket_cap: int | None = None  # None -> per-level heuristic
    # Static tile-pair capacity for the z-order tile conv backend
    # (ops/pallas/tile_conv.py). When set, big-N conv sites route to the tile
    # kernel instead of the bucket kernel; size with
    # ``ops.pallas.count_tile_pairs`` on representative data (+headroom) —
    # pairs beyond the capacity are dropped.
    tile_pairs: int | None = None
    # Optional PER-SITE chunked-step budgets for the tile kernels, measured
    # host-side on a representative batch (``tasks.common.auto_tile_steps``).
    # Keys: ``("conv", in_level, out_level, radius_key)`` and
    # ``("kde", level, radius_key)`` with ``radius_key = round(radius, 6)``.
    # The one ``tile_pairs`` knob is sized for the WORST level-0 site; other
    # sites need ~1.5-2x fewer chunked steps (measured, round 4), and padding
    # steps cost full kernel compute — a per-site ``max_steps`` removes that.
    # Budgets are measured+headroom, NOT worst-case: overflow on a denser
    # later scene is counted and fatal at the task boundary, exactly like
    # pair overflow.
    tile_steps: dict | None = None
    _nbh: dict = field(default_factory=dict)
    _pdf: dict = field(default_factory=dict)
    _buckets: dict = field(default_factory=dict)
    # Traced per-cloud dropped-pair counts from tile-backend queries built by
    # this cache (pdf path). Conv layers drain these into their diagnostics
    # so undersized ``tile_pairs`` REPORTS instead of silently corrupting.
    _tile_overflow: list = field(default_factory=list)

    def drain_tile_overflow(self) -> list:
        out, self._tile_overflow = self._tile_overflow, []
        return out

    def site_steps(self, kind: str, *key) -> int | None:
        """Measured per-site ``max_steps`` budget, or None (worst-case)."""
        if not self.tile_steps:
            return None
        *head, radius = key
        return self.tile_steps.get((kind, *head, round(float(radius), 6)))

    def neighborhood(
        self, in_level: int, out_level: int, radius: float, k: int | None = None
    ) -> Neighborhood:
        """Neighbors of out-level sample points among in-level source points.

        ``in_level < out_level`` is a down-sampling conv, equal a same-level
        conv, ``in_level > out_level`` an up-sampling decoder conv — all the
        same query, exactly like the reference (SURVEY §3.4)."""
        k = self.neighbor_k if k is None else k
        key = (in_level, out_level, float(radius), k)
        if key not in self._nbh:
            src = self.hierarchy.levels[in_level]
            dst = self.hierarchy.levels[out_level]
            k_eff = min(k, src.points.shape[1])
            self._nbh[key] = radius_neighbors(
                dst.points, dst.mask, src.points, src.mask, float(radius), k_eff
            )
        return self._nbh[key]

    def buckets(self, level: int, radius: float) -> BucketGrid:
        """Cell-bucket layout of a level at cell edge == conv radius (for the
        fused Pallas conv; see ops/pallas/mcconv_kernel.py)."""
        key = (level, float(radius))
        if key not in self._buckets:
            lvl = self.hierarchy.levels[level]
            cap = self.bucket_cap or default_cap(lvl.points.shape[1], float(radius))
            self._buckets[key] = build_buckets(
                lvl.points, lvl.mask, float(radius), cap
            )
        return self._buckets[key]

    def pdf(self, level: int, radius: float) -> Array:
        """KDE density of the given level's points at bandwidth
        ``kde_window * radius`` (reference: ``ComputePDF`` per conv radius)."""
        key = (level, float(radius))
        if key not in self._pdf:
            from ..core.pdf import DENSE_KDE_MAX_N

            lvl = self.hierarchy.levels[level]
            if (
                self.tile_pairs is not None
                and lvl.points.shape[1] > DENSE_KDE_MAX_N
            ):
                # big-scene EXACT density via the z-order tile kernel (no
                # K-capacity truncation). The tuned capacity is sized for
                # level 0; deeper levels run lossless (full bound) so the
                # one knob can never silently drop pairs there.
                pairs = self.tile_pairs if level == 0 else (1 << 30)
                dens, ovf = kde_density(
                    lvl.points,
                    lvl.mask,
                    float(radius),
                    kde_window=self.kde_window,
                    tile_pairs=pairs,
                    max_steps=self.site_steps("kde", level, radius),
                    with_overflow=True,
                )
                self._tile_overflow.append(ovf)
                self._pdf[key] = dens
                return self._pdf[key]
            nbh = None
            if (
                lvl.points.shape[1] > DENSE_KDE_MAX_N
                and lvl.self_nbh is not None
                and lvl.self_nbh.radius == float(radius)
            ):
                nbh = lvl.self_nbh
            self._pdf[key] = kde_density(
                lvl.points,
                lvl.mask,
                float(radius),
                kde_window=self.kde_window,
                neighborhood=nbh,
                k=min(self.pdf_neighbor_k, lvl.points.shape[1]),
            )
        return self._pdf[key]
