"""Network building blocks (flax.linen).

Reference parity (viscom-ulm/MCCNN): the conv creation half of
``utils/MCConvBuilder.py::ConvolutionBuilder.create_convolution`` (kernel-MLP
variables + ``spatial_conv``) and ``utils/MCNetworkUtils.py`` (``fully_connected``,
``batch_norm_RELU_drop_out``, 1x1 feature-mixing convs) — SURVEY §2.2.

The spatial conv is a flax module so parameters live in the standard flax
param tree; the spatial queries come from an explicit ``SpatialCache``
(api/builder.py), keeping modules pure functions of (params, inputs)."""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from ..api.builder import SpatialCache
from ..core.mcconv import KERNEL_HIDDEN, MCConvParams, mc_conv
from ..ops.dispatch import pick_backend
from ..ops.pallas import bucket_mc_conv, dense_mc_conv, tile_mc_conv


class MCConv(nn.Module):
    """Monte-Carlo spatial convolution between two hierarchy levels.

    ``c_out=None`` → depthwise (the reference's default ``multiFeatureConvs=
    False`` mode: per-channel kernel weights, channel mixing left to 1x1
    convs); otherwise a full conv to ``c_out`` channels.
    ``use_pdf=False`` mirrors the reference's ``usePDF`` flag (density
    correction off → pdf ≡ 1)."""

    c_in: int
    c_out: int | None = None
    hidden: int = KERNEL_HIDDEN
    use_pdf: bool = True

    @nn.compact
    def __call__(
        self,
        cache: SpatialCache,
        in_level: int,
        out_level: int,
        radius: float,
        features: Array,
    ) -> Array:
        hierarchy = cache.hierarchy
        src = hierarchy.levels[in_level]
        dst = hierarchy.levels[out_level]
        if self.use_pdf:
            pdf = cache.pdf(in_level, radius)
        else:
            pdf = jnp.ones_like(src.mask, dtype=features.dtype)

        out_dim = self.c_in if self.c_out is None else self.c_in * self.c_out
        params = MCConvParams(
            w1=self.param(
                "kernel_w1", nn.initializers.he_normal(), (3, self.hidden)
            ),
            b1=self.param("kernel_b1", nn.initializers.zeros, (self.hidden,)),
            w2=self.param(
                "kernel_w2", nn.initializers.he_normal(), (self.hidden, out_dim)
            ),
            b2=self.param("kernel_b2", nn.initializers.zeros, (out_dim,)),
        )
        # usePDF=False mode (reference flag): plain neighborhood mean
        mean_norm = not self.use_pdf
        backend = pick_backend(
            src.points.shape[1], radius, self.c_in, self.c_out,
            n_samples=dst.points.shape[1],
        )
        if backend == "bucket" and cache.tile_pairs is not None:
            backend = "tile"  # z-order tiles beat buckets at big-scene scale
        if backend == "tile":
            if cache.tile_pairs is None:
                raise ValueError(
                    "tile backend needs SpatialCache(tile_pairs=...) — size "
                    "it with ops.pallas.count_tile_pairs on representative "
                    "data"
                )
            # The tuned capacity is sized for LEVEL-0 sites (the only place
            # the full tile-pair bound is large). Deeper levels default to
            # LOSSLESS (max_pairs = their full bound) so one global knob can
            # never silently drop pairs there. A measured per-site
            # ``cache.tile_steps`` budget (tasks.common.auto_tile_steps)
            # tightens any site below its worst case — overflow stays
            # counted + fatal, so it trades padding compute for a LOUD
            # failure on an unluckily denser scene, never a silent one.
            if in_level == 0 or out_level == 0:
                max_pairs = cache.tile_pairs
            else:
                max_pairs = 1 << 30  # min()'d to nts*ntp inside
            out, overflow = tile_mc_conv(
                params, dst.points, dst.mask, src.points, src.mask,
                features, pdf, radius, max_pairs=max_pairs,
                max_steps=cache.site_steps("conv", in_level, out_level, radius),
                c_out=self.c_out, mean_normalize=mean_norm,
                with_overflow=True,
            )
            # Undersized static capacities REPORT instead of silently
            # dropping neighbor pairs: per-cloud dropped counts land in the
            # 'diagnostics' collection (tasks/common.py hard-errors on
            # nonzero after each train step).
            for ovf in [overflow, *cache.drain_tile_overflow()]:
                self.sow("diagnostics", "tile_overflow", jnp.max(ovf))
        elif backend == "dense":
            out = dense_mc_conv(
                params, dst.points, dst.mask, src.points, src.mask,
                features, pdf, radius, c_out=self.c_out,
                mean_normalize=mean_norm,
            )
        elif backend == "bucket":
            out = bucket_mc_conv(
                params,
                cache.buckets(out_level, radius),
                dst.mask,
                cache.buckets(in_level, radius),
                features,
                pdf,
                c_out=self.c_out,
                mean_normalize=mean_norm,
            )
        else:
            nbh = cache.neighborhood(in_level, out_level, radius)
            out = mc_conv(
                params, dst.points, nbh, src.points, features, pdf,
                c_out=self.c_out, mean_normalize=mean_norm,
            )
        return jnp.where(dst.mask[..., None], out, 0.0)


class Conv1x1(nn.Module):
    """Per-point feature mixing (the reference's 1x1 convs in MCNetworkUtils)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return nn.Dense(self.features, use_bias=self.use_bias)(x)


class BatchNormReluDropout(nn.Module):
    """BN → ReLU → dropout, masked-aware.

    Reference parity: ``MCNetworkUtils.batch_norm_RELU_drop_out``. The TF1
    reference schedules the BN running-average decay from 0.5 toward 0.99 over
    training (SURVEY §7 'hard parts': BN semantics move accuracy) — set
    ``schedule_steps`` to enable the same schedule; ``None`` keeps a fixed
    ``momentum``."""

    drop_rate: float = 0.0
    momentum: float = 0.9
    use_bn: bool = True
    schedule_steps: int | None = None

    @nn.compact
    def __call__(self, x: Array, mask: Array, train: bool) -> Array:
        if self.use_bn:
            x = MaskedBatchNorm(
                momentum=self.momentum, schedule_steps=self.schedule_steps
            )(x, mask, train)
        x = nn.relu(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return jnp.where(mask[..., None], x, 0.0)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the (batch, point) axes that ignores padded points.

    Plain ``nn.BatchNorm`` would fold zero padding into the statistics; with
    variable true point counts that skews activations, so moments are computed
    under the mask explicitly.

    ``schedule_steps`` enables the TF1 reference's decaying-momentum schedule
    (PointNet lineage, mirrored by MCCNN's task scripts): momentum(step) =
    min(0.99, 1 - 0.5 * 0.5^(step/schedule_steps)) — early training averages
    fast (momentum 0.5), late training averages slowly (0.99). The step
    counter lives in ``batch_stats`` so it checkpoints/restores with the
    running moments."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    schedule_steps: int | None = None

    @nn.compact
    def __call__(self, x: Array, mask: Array, train: bool) -> Array:
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), x.dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), x.dtype)
        )
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # Created eagerly (not just under ``train``) so the batch_stats pytree
        # structure is identical between init and the first train step —
        # checkpoint templates and shard_map out_specs rely on that.
        cnt = (
            self.variable(
                "batch_stats", "count", lambda: jnp.zeros((), jnp.float32)
            )
            if self.schedule_steps
            else None
        )

        if train:
            m = mask.reshape(-1)[:, None].astype(x.dtype)
            xf = x.reshape(-1, c)
            n = jnp.maximum(m.sum(), 1.0)
            mean = (xf * m).sum(0) / n
            var = ((xf - mean) ** 2 * m).sum(0) / n
            if self.schedule_steps:
                mom = jnp.minimum(
                    1.0 - 0.5 * 0.5 ** (cnt.value / self.schedule_steps), 0.99
                )
                cnt.value = cnt.value + 1.0
            else:
                mom = self.momentum
            ra_mean.value = mom * ra_mean.value + (1 - mom) * mean
            ra_var.value = mom * ra_var.value + (1 - mom) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class FullyConnected(nn.Module):
    """Dense + optional BN/ReLU/dropout head block (reference
    ``MCNetworkUtils.fully_connected``)."""

    features: int
    drop_rate: float = 0.0
    activation: Callable | None = nn.relu
    use_bn: bool = True
    momentum: float = 0.9
    schedule_steps: int | None = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        x = nn.Dense(self.features)(x)
        if self.use_bn:
            if self.schedule_steps:
                # decaying-momentum schedule needs our own BN (flax BatchNorm
                # momentum is static); full mask — head features are unpadded
                x = MaskedBatchNorm(schedule_steps=self.schedule_steps)(
                    x, jnp.ones(x.shape[:-1], bool), train
                )
            else:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=self.momentum
                )(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        return x
