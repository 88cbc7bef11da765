"""MCNorm / MCNormS — per-point normal estimation (regression).

Reference parity (viscom-ulm/MCCNN): ``models/MCNorm.py`` / ``MCNormS.py``
(SURVEY §2.2): encoder down the hierarchy, then up-sampling convs back to
level 0, ending in a per-point 3-vector; trained with an angular/cosine loss
against ground-truth normals (see train/losses.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..api.builder import SpatialCache
from ..api.hierarchy import build_hierarchy
from .layers import BatchNormReluDropout, Conv1x1, MCConv


class MCNorm(nn.Module):
    grow: int = 64
    radii: tuple[float, ...] = (0.1, 0.4)
    conv_radius_scale: float = 2.0
    neighbor_k: int = 32
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
            points, mask, self.radii, neighbor_k=self.neighbor_k, global_level=False
        )
        cache = SpatialCache(hier, neighbor_k=self.neighbor_k)
        g = self.grow
        n_levels = len(hier)
        widths = [g * (2**i) for i in range(n_levels - 1)]

        # Encoder: down-sampling convs, keep skips.
        x = features
        skips = []
        for lvl in range(n_levels - 1):
            radius = self.radii[lvl] * self.conv_radius_scale
            x = MCConv(
                c_in=x.shape[-1], c_out=widths[lvl], use_pdf=self.use_pdf,
                name=f"enc_{lvl}_{lvl + 1}",
            )(cache, lvl, lvl + 1, radius, x)
            x = BatchNormReluDropout(momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(
                x, hier.levels[lvl + 1].mask, train
            )
            skips.append(x)

        # Decoder: up-sampling convs (coarse sources -> fine samples), the
        # same op with levels reversed (SURVEY §3.4).
        for lvl in range(n_levels - 2, -1, -1):
            radius = self.radii[lvl] * self.conv_radius_scale
            x = MCConv(
                c_in=x.shape[-1], c_out=None, use_pdf=self.use_pdf,
                name=f"dec_{lvl + 1}_{lvl}",
            )(cache, lvl + 1, lvl, radius, x)
            out_mask = hier.levels[lvl].mask
            x = BatchNormReluDropout(momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(x, out_mask, train)
            if lvl > 0:
                x = jnp.concatenate([x, skips[lvl - 1]], axis=-1)
            x = Conv1x1(max(x.shape[-1] // 2, g), name=f"dec_mix_{lvl}")(x)
            x = BatchNormReluDropout(momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(x, out_mask, train)

        normals = nn.Dense(3, name="normals")(x)
        return jnp.where(mask[..., None], normals, 0.0)


class MCNormS(nn.Module):
    """Small variant: single-level encoder/decoder."""

    grow: int = 64
    radius: float = 0.15
    conv_radius_scale: float = 2.0
    neighbor_k: int = 32
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
        m = MCNorm(
            grow=self.grow,
            radii=(self.radius,),
            conv_radius_scale=self.conv_radius_scale,
            neighbor_k=self.neighbor_k,
            use_pdf=self.use_pdf,
            bn_momentum=self.bn_momentum,
            bn_schedule_steps=self.bn_schedule_steps,
            name="trunk",
        )
        return m(points, mask, features, train=train)
