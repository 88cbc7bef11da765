"""KDE sample-density estimation for the unbiased Monte-Carlo estimator.

Reference parity (viscom-ulm/MCCNN): ``tf_ops/compute_pdf.*`` (``ComputePDF``)
— per-neighbor Gaussian KDE with bandwidth ``KDEWindow * radius``
(SURVEY §2.1/§3.3; mount empty, no file:line).

TPU-native redesign: the reference evaluates the density lazily per neighbor
*pair*; we instead evaluate the density once **per source point** over its own
in-level neighborhood (a ``(B, N)`` tensor) and let convolutions gather it.
This is the same quantity p(y) (the density around sample y at its own level),
computed once and cached in the hierarchy instead of per conv — strictly less
work, identical estimator.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array

from .gather import batched_gather
from .neighbors import Neighborhood, self_neighbors

PALLAS_KDE_MAX_N = 4096  # fused kernel: source set + tile pair-block in VMEM
DENSE_KDE_MAX_N = 8192  # XLA dense O(N^2) path bound (B*N*N f32 memory)


def kde_density(
    points: Array,
    mask: Array,
    radius: float,
    *,
    kde_window: float = 0.25,
    neighborhood: Neighborhood | None = None,
    k: int = 32,
    tile_pairs: int | None = None,
    max_steps: int | None = None,
    with_overflow: bool = False,
) -> Array:
    """Gaussian-KDE sample density of each point within its own point set.

    ``density[b, j] = (1 / (h^3 * (2*pi)^{3/2})) * sum_k exp(-|y_j - y_k|^2 / (2 h^2))``

    where the sum runs over the in-radius neighbors of ``y_j`` (the point
    itself included, as in the reference) and ``h = kde_window * radius``.
    This is the UNNORMALIZED density — points per unit volume, estimating
    ``N * q(y)`` for sampling distribution q. Deliberately NO division by a
    local neighbor count: that would cancel exactly the density variation the
    Monte-Carlo ``1/pdf`` correction exists to remove. The paper's
    ball-normalized conditional ``p(y|x)`` combined with its ``1/|N(x)|``
    factor reduces algebraically to ``sum_j g f / density_j`` — see
    core/mcconv.py and tests/test_estimator_properties.py.

    Masked-out points get density 1.0 so downstream ``1/pdf`` stays finite
    (their contributions are masked anyway).

    Args:
      points: ``(B, N, 3)``; mask ``(B, N)``.
      radius: neighborhood support radius (the conv radius at this level).
      kde_window: bandwidth as a fraction of the radius (reference default 0.25).
      neighborhood: optional precomputed self-neighborhood (else computed here).
      k: neighbor capacity when computing the self-neighborhood.
      tile_pairs: static tile-pair capacity (``ops.pallas.count_tile_pairs``
        on the point set against itself) — routes to the EXACT z-order tile
        kernel, the big-scene path (no K truncation at any N).
      with_overflow: only valid together with ``tile_pairs`` — returns
        ``(density, dropped_pairs)`` (see ``tile_kde``).
    """
    h = kde_window * float(radius)
    N = points.shape[1]
    import jax

    if tile_pairs is not None:
        # Big-scene EXACT path: z-order tile kernel (no K truncation). The
        # static pair capacity comes from the caller (count_tile_pairs).
        from ..ops.pallas.tile_conv import tile_kde

        return tile_kde(
            points, mask, radius, max_pairs=tile_pairs, max_steps=max_steps,
            kde_window=kde_window, with_overflow=with_overflow,
        )

    if (
        neighborhood is None
        and N <= PALLAS_KDE_MAX_N
        and jax.default_backend() == "tpu"
    ):
        # fused on-chip variant: nothing (N, N)-shaped touches HBM
        from ..ops.pallas.density_kernel import kde_density_pallas

        return kde_density_pallas(points, mask, radius, kde_window=kde_window)

    if neighborhood is None and N <= DENSE_KDE_MAX_N:
        # Dense formulation: one MXU distance matrix + fused VPU exp/reduce —
        # no gathers (TPU gathers are slow), exact counts, ~20x faster.
        qq = jnp.sum(points * points, axis=-1)
        cross = jnp.einsum(
            "bnd,bmd->bnm", points, points, precision=jax.lax.Precision.HIGHEST
        )
        d2 = jnp.maximum(qq[:, :, None] + qq[:, None, :] - 2.0 * cross, 0.0)
        in_r = (d2 <= radius * radius) & mask[:, None, :]
        kern = jnp.where(in_r, jnp.exp(-0.5 * d2 / (h * h)), 0.0)
        norm = 1.0 / ((h**3) * (2.0 * math.pi) ** 1.5)
        return jnp.where(mask, norm * jnp.sum(kern, axis=-1), 1.0)

    if neighborhood is None:
        neighborhood = self_neighbors(points, mask, radius, k)
    nbr_pts = batched_gather(points, neighborhood.idx)  # (B, N, K, 3)
    d2 = jnp.sum((points[:, :, None, :] - nbr_pts) ** 2, axis=-1)
    kern = jnp.where(neighborhood.mask, jnp.exp(-0.5 * d2 / (h * h)), 0.0)
    # K-capacity truncation: the kept set is the NEAREST K of the true
    # in-radius neighbors. The dropped neighbors all lie in the shell
    # [r_K, radius] (r_K = K-th neighbor distance), so their kernel mass is
    # estimated in closed form: (count - kept) x the mean Gaussian value over
    # that shell under a uniform-in-shell assumption. Round 1 instead rescaled
    # the kept sum by count/kept, which over-estimates badly in dense regions
    # (far neighbors carry ~zero kernel mass at h = 0.25 r but were credited
    # with the kept set's average) — quantified in tests/test_pdf.py.
    kept = jnp.maximum(jnp.sum(neighborhood.mask, axis=-1), 1)
    dropped = jnp.maximum(neighborhood.count - kept, 0).astype(points.dtype)
    r_k = jnp.sqrt(jnp.max(jnp.where(neighborhood.mask, d2, 0.0), axis=-1))
    tail = _gaussian_shell_mean(r_k, jnp.float32(radius), h)
    norm = 1.0 / ((h**3) * (2.0 * math.pi) ** 1.5)
    density = norm * (jnp.sum(kern, axis=-1) + dropped * tail)
    return jnp.where(mask, density, 1.0)


def _gaussian_shell_mean(d0: Array, d1: Array, h: float) -> Array:
    """Mean of ``exp(-d^2 / (2 h^2))`` over the spherical shell ``[d0, d1]``
    (volume-weighted). Closed form via
    ``int d^2 e^{-d^2/2h^2} dd = -h^2 d e^{-d^2/2h^2} + h^3 sqrt(pi/2) erf(d / (sqrt(2) h))``."""
    from jax.scipy.special import erf

    s2h = math.sqrt(2.0) * h

    def antideriv(d):
        return -(h * h) * d * jnp.exp(-0.5 * d * d / (h * h)) + (
            h**3
        ) * math.sqrt(math.pi / 2.0) * erf(d / s2h)

    mass = antideriv(d1) - antideriv(d0)  # times 4*pi, cancelled below
    vol = (d1**3 - d0**3) / 3.0  # shell volume / (4*pi)
    return jnp.where(vol > 1e-20, mass / jnp.maximum(vol, 1e-20), 0.0)
