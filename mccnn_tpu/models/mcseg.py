"""MCSeg — U-Net-style encoder-decoder for point-cloud segmentation.

Reference parity (viscom-ulm/MCCNN): ``models/MCSeg.py`` (SURVEY §2.2/§3.4):
4-5 hierarchy levels (radii ~0.025/0.1/0.4/global-ish), encoder of
down-sampling convs with growing features, decoder of up-sampling convs
(coarse→fine, the same op with levels reversed) + skip concatenation + 1x1
mixing, ending in per-point logits. Optional per-cloud category one-hot
(ShapeNet) is broadcast and concatenated to the input features.

Every submodule carries an explicit name so the parameter tree is a stable
contract: the spatially-sharded trainer (parallel/sharded_mcseg.py) runs this
exact network as a pure function over the SAME flax variables, making block
and spatial checkpoints interchangeable."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..api.builder import SpatialCache
from ..api.hierarchy import PointHierarchy, build_hierarchy
from .layers import BatchNormReluDropout, Conv1x1, MCConv


class MCSeg(nn.Module):
    n_classes: int = 50
    grow: int = 64
    radii: tuple[float, ...] = (0.025, 0.1, 0.4)
    conv_radius_scale: float = 2.0
    neighbor_k: int = 32
    drop_rate: float = 0.2
    use_pdf: bool = True
    bn_momentum: float = 0.9
    bn_schedule_steps: int | None = None
    # Static tile-pair capacity: routes big-N conv/pdf sites to the z-order
    # tile kernels (whole-scene single-chip path; see ops/pallas/tile_conv.py)
    tile_pairs: int | None = None
    # Optional per-site chunked-step budgets for those tile kernels (keys as
    # in SpatialCache.tile_steps). Measured host-side at the task boundary
    # (tasks.common.auto_tile_steps via ``tile_sites()``); sites absent from
    # the dict keep the worst-case budget derived from ``tile_pairs``.
    tile_steps: dict | None = None

    def tile_sites(self, n_levels: int) -> list[tuple]:
        """Every (conv/kde) tile-kernel site this network queries, as
        SpatialCache.tile_steps keys — lets the task boundary measure a
        tight per-site step budget on a concrete example batch."""
        sites = [("conv", 0, 0, round(float(self.radii[0]), 6)),
                 ("kde", 0, round(float(self.radii[0]), 6))]
        for lvl in range(n_levels - 1):
            r = round(float(self.radii[lvl]) * self.conv_radius_scale, 6)
            sites += [("conv", lvl, lvl + 1, r),   # encoder
                      ("conv", lvl + 1, lvl, r),   # decoder
                      ("kde", lvl, r),             # encoder pdf (source lvl)
                      ("kde", lvl + 1, r),         # decoder pdf
                      # Poisson cover sweep sampling level lvl+1 FROM lvl
                      ("sweep", lvl, round(float(self.radii[lvl]), 6))]
        return sites

    def _bn(self, name: str, drop_rate: float = 0.0) -> BatchNormReluDropout:
        return BatchNormReluDropout(
            momentum=self.bn_momentum,
            schedule_steps=self.bn_schedule_steps,
            drop_rate=drop_rate,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        points: Array,
        mask: Array,
        features: Array | None = None,
        category_onehot: Array | None = None,  # (B, n_categories) for ShapeNet
        *,
        train: bool = False,
        hierarchy: PointHierarchy | None = None,
    ) -> Array:
        B, N, _ = points.shape
        if features is None:
            features = jnp.ones((B, N, 1), points.dtype)
        if category_onehot is not None:
            cat = jnp.broadcast_to(
                category_onehot[:, None, :], (B, N, category_onehot.shape[-1])
            ).astype(features.dtype)
            features = jnp.concatenate([features, cat], axis=-1)

        # ``hierarchy`` lets callers inject precomputed levels (e.g. the
        # nested-mask view from the spatially-sharded trainer, via
        # api.hierarchy.hierarchy_from_masks) — the network itself is then a
        # pure function of (params, levels, features).
        hier = hierarchy
        if hier is None:
            hier = build_hierarchy(
                points, mask, self.radii, neighbor_k=self.neighbor_k,
                global_level=False, tile_pairs=self.tile_pairs,
                tile_steps=self.tile_steps,
            )
        for lvl in hier.levels:
            if lvl.sample is not None and lvl.sample.overflow is not None:
                # tile-sampler pair-capacity overflow (see SampleSet.overflow)
                self.sow(
                    "diagnostics", "tile_overflow", jnp.max(lvl.sample.overflow)
                )
        cache = SpatialCache(
            hier, neighbor_k=self.neighbor_k, tile_pairs=self.tile_pairs,
            tile_steps=self.tile_steps,
        )
        g = self.grow
        n_levels = len(hier)
        widths = [g * (2**i) for i in range(n_levels - 1)]  # per encoder level

        # Stem at full resolution.
        x = MCConv(
            c_in=features.shape[-1], c_out=g, use_pdf=self.use_pdf, name="stem"
        )(cache, 0, 0, self.radii[0], features)
        x = self._bn("stem_bn")(x, mask, train)

        skips = [x]
        for lvl in range(n_levels - 1):
            radius = self.radii[lvl] * self.conv_radius_scale
            out_mask = hier.levels[lvl + 1].mask
            x = MCConv(
                c_in=x.shape[-1], c_out=None, use_pdf=self.use_pdf,
                name=f"enc_{lvl}_{lvl + 1}",
            )(cache, lvl, lvl + 1, radius, x)
            x = self._bn(f"enc_bn_{lvl + 1}")(x, out_mask, train)
            x = Conv1x1(widths[lvl] * 2, name=f"enc_mix_{lvl + 1}")(x)
            x = self._bn(f"enc_mix_bn_{lvl + 1}")(x, out_mask, train)
            if lvl + 1 < n_levels - 1:
                skips.append(x)

        for lvl in range(n_levels - 2, -1, -1):
            radius = self.radii[lvl] * self.conv_radius_scale
            out_mask = hier.levels[lvl].mask
            x = MCConv(
                c_in=x.shape[-1], c_out=None, use_pdf=self.use_pdf,
                name=f"dec_{lvl + 1}_{lvl}",
            )(cache, lvl + 1, lvl, radius, x)
            x = self._bn(f"dec_bn_{lvl}")(x, out_mask, train)
            x = jnp.concatenate([x, skips[lvl]], axis=-1)
            x = Conv1x1(max(x.shape[-1] // 2, g), name=f"dec_mix_{lvl}")(x)
            x = self._bn(
                f"dec_mix_bn_{lvl}",
                drop_rate=self.drop_rate if lvl == 0 else 0.0,
            )(x, out_mask, train)

        logits = nn.Dense(self.n_classes, name="logits")(x)
        return jnp.where(mask[..., None], logits, 0.0)
