"""MCClassS — the small single-path ModelNet40 classifier.

Reference parity (viscom-ulm/MCCNN): ``models/MCClassS.py`` (SURVEY §2.2):
3-level Poisson hierarchy (radii ~0.1 / 0.4 / global), a chain of
conv→BN→ReLU with features growing ~128→256→1024, then an FC head with
dropout to the class logits.  Exact reference hyperparameters are
unverifiable this round (mount empty) — every knob is exposed on the module
so parity tuning is config-only."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..api.builder import SpatialCache
from ..api.hierarchy import GLOBAL_RADIUS, build_hierarchy
from .layers import BatchNormReluDropout, FullyConnected, MCConv


class MCClassS(nn.Module):
    n_classes: int = 40
    grow: int = 128
    radii: tuple[float, ...] = (0.1, 0.4)
    conv_radius_scale: float = 2.0
    neighbor_k: int = 32
    drop_rate: float = 0.5
    use_pdf: bool = True
    bn_momentum: float = 0.9
    bn_schedule_steps: int | None = None

    @nn.compact
    def __call__(
        self,
        points: Array,  # (B, N, 3), normalized to the unit cube
        mask: Array,  # (B, N)
        features: Array | None = None,  # (B, N, C); default all-ones
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

        widths = [g, 2 * g, 8 * g]
        x = features
        for lvl, w in enumerate(widths):
            in_level, out_level = lvl, lvl + 1
            radius = (
                GLOBAL_RADIUS
                if out_level == len(hier) - 1
                else self.radii[lvl] * self.conv_radius_scale
            )
            x = MCConv(
                c_in=x.shape[-1], c_out=w, use_pdf=self.use_pdf,
                name=f"conv_{in_level}_{out_level}",
            )(cache, in_level, out_level, radius, x)
            x = BatchNormReluDropout(momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(
                x, hier.levels[out_level].mask, train
            )

        x = x[:, 0]  # (B, 8g) — the global level has one point per cloud
        x = FullyConnected(4 * g, drop_rate=self.drop_rate, momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(
            x, train
        )
        x = FullyConnected(g, drop_rate=self.drop_rate, momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(
            x, train
        )
        return nn.Dense(self.n_classes, name="logits")(x)
