"""MCClass — the deeper single-path ModelNet40 classifier.

Reference parity (viscom-ulm/MCCNN): ``models/MCClass.py`` (SURVEY §2.2):
like MCClassS but with extra same-level depthwise convs and 1x1 feature-mixing
layers between the down-sampling convs — the reference's separable
(depthwise spatial conv + pointwise mix) pattern that keeps the kernel-MLP
cost linear in channels."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..api.builder import SpatialCache
from ..api.hierarchy import GLOBAL_RADIUS, build_hierarchy
from .layers import BatchNormReluDropout, Conv1x1, FullyConnected, MCConv


class MCClass(nn.Module):
    n_classes: int = 40
    grow: int = 64
    radii: tuple[float, ...] = (0.1, 0.2, 0.4)
    conv_radius_scale: float = 2.0
    neighbor_k: int = 32
    drop_rate: float = 0.5
    point_drop_rate: float = 0.2  # dropout on per-point features mid-trunk
    use_pdf: bool = True
    bn_momentum: float = 0.9
    bn_schedule_steps: int | None = None

    @nn.compact
    def __call__(
        self,
        points: Array,
        mask: Array,
        features: Array | None = None,
        *,
        train: bool = False,
    ) -> Array:
        if features is None:
            features = jnp.ones(points.shape[:-1] + (1,), points.dtype)
        hier = build_hierarchy(
            points, mask, self.radii, neighbor_k=self.neighbor_k, global_level=True
        )
        cache = SpatialCache(hier, neighbor_k=self.neighbor_k)
        g = self.grow

        # Stem: full conv into the first hidden width at level 0.
        x = MCConv(c_in=features.shape[-1], c_out=g, use_pdf=self.use_pdf, name="stem")(
            cache, 0, 0, self.radii[0], features
        )
        x = BatchNormReluDropout(momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(x, hier.levels[0].mask, train)

        widths = [2 * g, 4 * g, 8 * g, 16 * g]  # per level after downsampling
        n_levels = len(hier)
        for lvl in range(n_levels - 1):
            out_level = lvl + 1
            radius = (
                GLOBAL_RADIUS
                if out_level == n_levels - 1
                else self.radii[lvl] * self.conv_radius_scale
            )
            out_mask = hier.levels[out_level].mask
            # Down-sampling depthwise conv, then 1x1 expansion (separable).
            x = MCConv(
                c_in=x.shape[-1], c_out=None, use_pdf=self.use_pdf,
                name=f"down_{lvl}_{out_level}",
            )(cache, lvl, out_level, radius, x)
            x = BatchNormReluDropout(
                momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps,
                drop_rate=self.point_drop_rate if train else 0.0,
            )(x, out_mask, train)
            x = Conv1x1(widths[min(lvl, len(widths) - 1)], name=f"mix_{out_level}")(x)
            x = BatchNormReluDropout(momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(x, out_mask, train)
            # Same-level depthwise conv with residual mixing (except global lvl).
            if out_level < n_levels - 1:
                y = MCConv(
                    c_in=x.shape[-1], c_out=None, use_pdf=self.use_pdf,
                    name=f"same_{out_level}",
                )(cache, out_level, out_level, self.radii[lvl] * self.conv_radius_scale, x)
                y = BatchNormReluDropout(momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(y, out_mask, train)
                x = x + Conv1x1(x.shape[-1], name=f"same_mix_{out_level}")(y)

        x = x[:, 0]
        x = FullyConnected(8 * g, drop_rate=self.drop_rate, momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(
            x, train
        )
        x = FullyConnected(2 * g, drop_rate=self.drop_rate, momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(
            x, train
        )
        return nn.Dense(self.n_classes, name="logits")(x)
