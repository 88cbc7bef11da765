"""Multi-level point hierarchy + encoder/decoder network under spatial
sharding — hierarchy construction composed with halo convs (the round-2 item
declared in PARITY.md / sharded_seg.py).

The reference handles huge scenes by chopping them into independent CPU
blocks (SURVEY §5.7), losing all cross-block context; round 1 built the two
ingredients (exact halo convs in ``spatial.py``, boundary-reconciled Poisson
sampling in ``sharded_sampling.py``). This module composes them into a full
multi-level MCSeg-style network that runs with the point set sharded into
x-slabs across a mesh axis:

  * Hierarchy levels are NESTED MASKS over the shard's point array — points
    never move, so no gathers/compaction anywhere (TPU-hostile), and every
    level's geometry stays in global coordinates for the halo machinery.
  * Each level l+1 is a ``sharded_poisson_disk`` selection of level l at
    ``radii[l]`` (exact global min-distance; ~2r coverage at slab boundaries).
  * Every radius-bounded op (KDE density, down/up convs) consumes
    halo-augmented sources, so GIVEN the level masks the network output is
    EXACTLY equal to the unsharded computation (``unsharded_mcseg_apply`` is
    the oracle; tests/test_spatial.py compares them on the 8-device mesh).

Call ``sharded_mcseg_apply`` inside ``shard_map`` over a 1-D mesh axis;
``tasks/scannet.py --spatial-shards N`` wires it into training.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax import Array

from ..core.mcconv import MCConvParams, init_mcconv_params, mc_conv
from ..core.neighbors import radius_neighbors
from ..core.pdf import kde_density
from .sharded_sampling import sharded_poisson_disk
from .spatial import exchange_halos, slab_bounds


class ShardedMCSegParams(NamedTuple):
    enc: tuple  # MCConvParams per level: full conv l -> l+1
    dec: tuple  # MCConvParams per level: full conv l+1 -> l (index = fine lvl)
    mix_w: tuple  # post-concat 1x1 mixes on the decoder path
    mix_b: tuple
    head_w: Array
    head_b: Array


def init_sharded_mcseg(
    key: jax.Array, c_in: int, widths: Sequence[int], n_classes: int
) -> ShardedMCSegParams:
    """``widths[l]`` is the feature width produced at level l+1 (encoder) and
    restored at level l (decoder)."""
    L = len(widths)
    keys = jax.random.split(key, 3 * L + 1)
    he = jax.nn.initializers.he_normal()
    enc, dec, mix_w, mix_b = [], [], [], []
    c = c_in
    for l in range(L):
        enc.append(init_mcconv_params(keys[l], c, widths[l]))
        c = widths[l]
    for l in range(L):  # decoder conv producing level-l features
        c_coarse = widths[l] if l == L - 1 else widths[l + 1]
        dec.append(init_mcconv_params(keys[L + l], c_coarse, widths[l]))
        c_skip = c_in if l == 0 else widths[l - 1]
        mix_w.append(he(keys[2 * L + l], (widths[l] + c_skip, widths[l])))
        mix_b.append(jnp.zeros((widths[l],)))
    return ShardedMCSegParams(
        enc=tuple(enc),
        dec=tuple(dec),
        mix_w=tuple(mix_w),
        mix_b=tuple(mix_b),
        head_w=he(keys[-1], (widths[0], n_classes)),
        head_b=jnp.zeros((n_classes,)),
    )


def sharded_build_levels(
    points: Array,  # (N_shard, 3) GLOBAL coordinates
    mask: Array,  # (N_shard,)
    radii: Sequence[float],
    shard_lo: Array,
    shard_hi: Array,
    halo_cap: int,
    axis_name: str,
) -> tuple[list, Array]:
    """Nested level masks: level 0 = ``mask``; level l+1 = boundary-reconciled
    Poisson selection of level l at ``radii[l]``. Returns (masks, overflow) —
    nonzero overflow means ``halo_cap`` was too small (ADVICE r1: surfaced,
    not swallowed)."""
    masks = [mask]
    overflow = jnp.zeros((), jnp.int32)
    for r in radii:
        sel, ovf = sharded_poisson_disk(
            points, masks[-1], float(r), shard_lo, shard_hi, halo_cap,
            axis_name,
        )
        masks.append(sel)
        overflow = overflow + ovf
    return masks, overflow


def _halo_conv(
    params: MCConvParams,
    points: Array,
    smp_mask: Array,  # samples: this shard's level-out mask
    src_mask: Array,  # sources: this shard's level-in mask
    feats: Array,  # (N_shard, C) features on the source level's points
    pdf: Array,  # (N_shard,) source-level KDE densities
    radius: float,
    lo,
    hi,
    halo_cap: int,
    axis_name: str,
    k: int,
    c_out: int | None,
    backend: str = "jnp",
) -> Array:
    aug = exchange_halos(
        points, src_mask, {"f": feats, "pdf": pdf}, lo, hi, radius, halo_cap,
        axis_name,
    )
    pdf_aug = jnp.maximum(aug.values["pdf"], 1e-12)
    if backend == "dense":
        # per-shard compute on the fused dense Pallas kernel (VERDICT r2 #5):
        # exact (unbounded neighbor capacity), MXU-dense — the per-chip hot
        # path when training real scenes under shard_map
        from ..ops.pallas import dense_mc_conv

        out = dense_mc_conv(
            params, points[None], smp_mask[None], aug.points[None],
            aug.mask[None], aug.values["f"][None], pdf_aug[None], radius,
            c_out=c_out, interpret=jax.default_backend() != "tpu",
        )[0]
    else:
        nbh = radius_neighbors(
            points[None], smp_mask[None], aug.points[None], aug.mask[None],
            radius, k,
        )
        out = mc_conv(
            params, points[None], nbh, aug.points[None], aug.values["f"][None],
            pdf_aug[None], c_out=c_out,
        )[0]
    return jnp.where(smp_mask[:, None], out, 0.0)


def _level_pdf(points, lvl_mask, radius, lo, hi, halo_cap, axis_name):
    """KDE density of this level's LOCAL points with halo-complete support."""
    aug = exchange_halos(
        points, lvl_mask, {}, lo, hi, radius, halo_cap, axis_name
    )
    return kde_density(aug.points[None], aug.mask[None], radius)[
        0, : points.shape[0]
    ]


def sharded_mcseg_apply(
    params: ShardedMCSegParams,
    points: Array,  # (N_shard, 3) GLOBAL coordinates
    mask: Array,  # (N_shard,)
    features: Array,  # (N_shard, C_in)
    *,
    radii: Sequence[float],
    conv_radius_scale: float = 2.0,
    halo_cap: int,
    axis_name: str,
    n_shards: int,
    neighbor_k: int = 16,
    level_masks: Sequence[Array] | None = None,
    backend: str = "jnp",
) -> tuple[Array, list, Array]:
    """Per-point logits for this shard's points (U-Net over a sharded
    hierarchy). Returns ``(logits, level_masks, halo_overflow)``.

    ``level_masks`` can be passed in (e.g. by the exactness test, or to reuse
    a hierarchy across training steps on the SAME un-augmented scene —
    tasks/scannet.py caches them per scene after epoch 0); otherwise they are
    built with ``sharded_build_levels``. ``backend="dense"`` routes each
    shard's convs through the fused dense Pallas kernel (exact; pair the
    oracle with the same backend when comparing)."""
    lo, hi = slab_bounds(n_shards, axis_name)
    L = len(radii)
    overflow = jnp.zeros((), jnp.int32)
    if level_masks is None:
        level_masks, overflow = sharded_build_levels(
            points, mask, radii, lo, hi, halo_cap, axis_name
        )

    conv_r = [float(r) * conv_radius_scale for r in radii]
    pdfs = [
        _level_pdf(points, level_masks[l], conv_r[l], lo, hi, halo_cap, axis_name)
        for l in range(L)
    ]

    # encoder: conv l -> l+1 at radius conv_r[l], ReLU
    skips = [features]
    x = features
    for l in range(L):
        x = _halo_conv(
            params.enc[l], points, level_masks[l + 1], level_masks[l], x,
            pdfs[l], conv_r[l], lo, hi, halo_cap, axis_name, neighbor_k,
            _c_out(params.enc[l], x.shape[-1]), backend,
        )
        x = jax.nn.relu(x)
        if l < L - 1:
            skips.append(x)

    # decoder: conv l+1 -> l (sources = coarse level), concat skip, 1x1 mix
    for l in reversed(range(L)):
        pdf_coarse = _level_pdf(
            points, level_masks[l + 1], conv_r[l], lo, hi, halo_cap, axis_name
        )
        up = _halo_conv(
            params.dec[l], points, level_masks[l], level_masks[l + 1], x,
            pdf_coarse, conv_r[l], lo, hi, halo_cap, axis_name, neighbor_k,
            _c_out(params.dec[l], x.shape[-1]), backend,
        )
        cat = jnp.concatenate([up, skips[l]], axis=-1)
        x = jax.nn.relu(cat @ params.mix_w[l] + params.mix_b[l])
        x = jnp.where(level_masks[l][:, None], x, 0.0)

    logits = x @ params.head_w + params.head_b
    return jnp.where(mask[:, None], logits, 0.0), list(level_masks), overflow


def _c_out(p: MCConvParams, c_in: int) -> int:
    """Output width of a full MC conv from its w2 shape (H, c_in * c_out)."""
    return p.w2.shape[1] // c_in


def unsharded_mcseg_apply(
    params: ShardedMCSegParams,
    points: Array,  # (N, 3)
    mask: Array,
    features: Array,
    level_masks: Sequence[Array],  # from the sharded run (global order)
    *,
    radii: Sequence[float],
    conv_radius_scale: float = 2.0,
    neighbor_k: int = 16,
    backend: str = "jnp",
) -> Array:
    """Single-device oracle: identical math on the SAME level masks (the
    Poisson selection near slab boundaries differs from unsharded sampling by
    documented design, so exactness is stated conditional on the hierarchy).
    Pass the same ``backend`` as the sharded run (the jnp path is K-capacity
    truncated; dense is exact — mixing them is not an apples comparison)."""
    L = len(radii)
    conv_r = [float(r) * conv_radius_scale for r in radii]

    def level_pdf(lvl_mask, radius):
        return kde_density(points[None], lvl_mask[None], radius)[0]

    def conv(p, smp_mask, src_mask, feats, pdf, radius):
        if backend == "dense":
            from ..ops.pallas import dense_mc_conv

            out = dense_mc_conv(
                p, points[None], smp_mask[None], points[None], src_mask[None],
                feats[None], jnp.maximum(pdf, 1e-12)[None], radius,
                c_out=_c_out(p, feats.shape[-1]),
                interpret=jax.default_backend() != "tpu",
            )[0]
        else:
            nbh = radius_neighbors(
                points[None], smp_mask[None], points[None], src_mask[None],
                radius, neighbor_k,
            )
            out = mc_conv(
                p, points[None], nbh, points[None], feats[None],
                jnp.maximum(pdf, 1e-12)[None], c_out=_c_out(p, feats.shape[-1]),
            )[0]
        return jnp.where(smp_mask[:, None], out, 0.0)

    skips = [features]
    x = features
    for l in range(L):
        pdf = level_pdf(level_masks[l], conv_r[l])
        x = jax.nn.relu(
            conv(params.enc[l], level_masks[l + 1], level_masks[l], x, pdf,
                 conv_r[l])
        )
        if l < L - 1:
            skips.append(x)
    for l in reversed(range(L)):
        pdf_coarse = level_pdf(level_masks[l + 1], conv_r[l])
        up = conv(
            params.dec[l], level_masks[l], level_masks[l + 1], x, pdf_coarse,
            conv_r[l],
        )
        cat = jnp.concatenate([up, skips[l]], axis=-1)
        x = jax.nn.relu(cat @ params.mix_w[l] + params.mix_b[l])
        x = jnp.where(level_masks[l][:, None], x, 0.0)
    logits = x @ params.head_w + params.head_b
    return jnp.where(mask[:, None], logits, 0.0)
