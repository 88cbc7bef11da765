"""MCClassH — the hierarchical two-path classifier for non-uniform sampling.

Reference parity (viscom-ulm/MCCNN): ``models/MCClassH.py`` (SURVEY §2.2):
two parallel conv paths over different hierarchy densities whose descriptors
are combined for a joint prediction, trained with per-path + joint losses so
the model stays robust when the input sampling is non-uniform (the paper's
robustness experiments: gradient / split / lambert / occlusion protocols).

Design here: path A consumes the full cloud through a deeper trunk; path B
first Poisson-subsamples aggressively (seeing a sparser, more uniform cloud)
and runs a shallower trunk. Both produce a global descriptor; the joint head
consumes their concatenation. ``__call__`` returns (joint, a, b) logits —
the training loss combines all three (see train/losses.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..api.builder import SpatialCache
from ..api.hierarchy import GLOBAL_RADIUS, build_hierarchy
from .layers import BatchNormReluDropout, FullyConnected, MCConv


class _Trunk(nn.Module):
    """Conv trunk down a hierarchy to the global descriptor."""

    radii: tuple[float, ...]
    widths: tuple[int, ...]
    conv_radius_scale: float
    neighbor_k: int
    use_pdf: bool
    bn_momentum: float
    bn_schedule_steps: int | None = None
    start_level: int = 0

    @nn.compact
    def __call__(self, hier, features: Array, train: bool) -> Array:
        cache = SpatialCache(hier, neighbor_k=self.neighbor_k)
        x = features
        n_levels = len(hier)
        for i, w in enumerate(self.widths):
            in_level = self.start_level + i
            out_level = in_level + 1
            radius = (
                GLOBAL_RADIUS
                if out_level == n_levels - 1
                else self.radii[i] * self.conv_radius_scale
            )
            x = MCConv(
                c_in=x.shape[-1], c_out=w, use_pdf=self.use_pdf,
                name=f"conv_{in_level}_{out_level}",
            )(cache, in_level, out_level, radius, x)
            x = BatchNormReluDropout(momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps)(
                x, hier.levels[out_level].mask, train
            )
        return x[:, 0]


class MCClassH(nn.Module):
    n_classes: int = 40
    grow: int = 128
    radii_a: tuple[float, ...] = (0.1, 0.4)
    radii_b: tuple[float, ...] = (0.2, 0.4)
    subsample_radius_b: float = 0.1  # path B sees a Poisson-thinned cloud
    conv_radius_scale: float = 2.0
    neighbor_k: int = 32
    drop_rate: float = 0.5
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
    ) -> tuple[Array, Array, Array]:
        if features is None:
            features = jnp.ones(points.shape[:-1] + (1,), points.dtype)
        g = self.grow

        # Path A: full-density hierarchy.
        hier_a = build_hierarchy(
            points, mask, self.radii_a, neighbor_k=self.neighbor_k, global_level=True
        )
        desc_a = _Trunk(
            radii=self.radii_a,
            widths=(g, 2 * g, 8 * g),
            conv_radius_scale=self.conv_radius_scale,
            neighbor_k=self.neighbor_k,
            use_pdf=self.use_pdf,
            bn_momentum=self.bn_momentum,
            bn_schedule_steps=self.bn_schedule_steps,
            name="path_a",
        )(hier_a, features, train)

        # Path B: Poisson-thinned cloud (uniformized density), then its own
        # hierarchy — the thinning is the robustness mechanism: a non-uniform
        # input collapses to a near-uniform subset at radius subsample_radius_b.
        hier_b = build_hierarchy(
            points,
            mask,
            (self.subsample_radius_b,) + self.radii_b,
            neighbor_k=self.neighbor_k,
            global_level=True,
        )
        ss = hier_b.levels[1].sample
        feats_b = jnp.where(
            ss.mask[..., None],
            jnp.take_along_axis(
                features, ss.idx[..., None].repeat(features.shape[-1], -1), axis=1
            ),
            0.0,
        )
        # Path B's trunk starts at level 1 (the thinned cloud).
        desc_b = _Trunk(
            radii=self.radii_b,
            widths=(g, 2 * g, 8 * g),
            conv_radius_scale=self.conv_radius_scale,
            neighbor_k=self.neighbor_k,
            use_pdf=self.use_pdf,
            bn_momentum=self.bn_momentum,
            bn_schedule_steps=self.bn_schedule_steps,
            start_level=1,
            name="path_b",
        )(hier_b, feats_b, train)

        def head(x, name):
            x = FullyConnected(
                4 * g, drop_rate=self.drop_rate, momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps,
                name=f"{name}_fc1",
            )(x, train)
            x = FullyConnected(
                g, drop_rate=self.drop_rate, momentum=self.bn_momentum, schedule_steps=self.bn_schedule_steps,
                name=f"{name}_fc2",
            )(x, train)
            return nn.Dense(self.n_classes, name=f"{name}_logits")(x)

        logits_a = head(desc_a, "a")
        logits_b = head(desc_b, "b")
        logits_joint = head(jnp.concatenate([desc_a, desc_b], axis=-1), "joint")
        return logits_joint, logits_a, logits_b
