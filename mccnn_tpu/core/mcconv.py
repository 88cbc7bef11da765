"""Monte-Carlo spatial convolution — the framework's hot op.

Reference parity (viscom-ulm/MCCNN): ``tf_ops/spatial_conv.*`` (``SpatialConv``
/ ``SpatialConvGrad``) — per neighbor, normalize the offset by the radius,
evaluate a small kernel-MLP (one hidden layer, ~8 units, ReLU; paper §4),
weight the neighbor's features by ``kernel / pdf``, and average over the
neighborhood (SURVEY §2.1/§3.3; mount empty, no file:line).  The reference
backward is an atomics scatter-add CUDA kernel; here reverse-mode AD of the
dense masked formulation yields a deterministic segment-sum backward for free
(no atomics on TPU — bitwise-reproducible gradients, see tests).

Estimator (per output sample i), density-corrected mode (``use_pdf=True``):

  out[i] = sum_{j in N(i)}  g((y_j - x_i)/r) * f[j] / density[j]

with ``density`` the UNNORMALIZED KDE sample density (points per unit volume,
core/pdf.py). No neighbor-count division: the paper's ``(1/|N(x)|) * sum
f g / p(y|x)`` with the ball-normalized conditional ``p(y|x) = density(y) /
(|N(x)| / ...)`` reduces algebraically to exactly this expression, and this
form is what makes the estimate a consistent Monte-Carlo estimate of the
continuous integral — invariant to the sampling protocol (the paper's
central claim; checked in tests/test_estimator_properties.py and
test_mcconv.py::test_unbiased_under_nonuniform_sampling).

Mean mode (``mean_normalize=True``, the reference's ``usePDF=False``):

  out[i] = (1 / k_i) * sum_{j kept}  g((y_j - x_i)/r) * f[j]

i.e. a plain neighborhood average over the ``k_i`` kept neighbors (when the
fixed-capacity list truncates, the kept subsample's mean estimates the full
neighborhood mean).

Two kernel shapes (mirroring the reference's ``multiFeatureConvs`` flag):
  * 'depthwise' (reference default): MLP 3 -> H -> Cin; out channel c gets
    kernel weight w[c] * f[c] — channel mixing is then done by separate 1x1
    convs, as in the reference models.
  * 'full': MLP 3 -> H -> Cin*Cout; a dense spatial conv.

This file is the portable jnp implementation (chunked over samples to bound
the (m, K, C) intermediate).  The fused Pallas kernel in
``ops/pallas/mcconv_kernel.py`` is numerically parity-tested against this.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from .gather import batched_gather
from .neighbors import Neighborhood

KERNEL_HIDDEN = 8  # paper: one hidden layer with 8 neurons


class MCConvParams(NamedTuple):
    """Kernel-MLP parameters. w2 is (H, Cin) for depthwise, (H, Cin*Cout) for full."""

    w1: Array  # (3, H)
    b1: Array  # (H,)
    w2: Array  # (H, Cin) | (H, Cin*Cout)
    b2: Array  # matching w2's trailing dim


def init_mcconv_params(
    key: jax.Array,
    c_in: int,
    c_out: int | None = None,
    hidden: int = KERNEL_HIDDEN,
    dtype=jnp.float32,
) -> MCConvParams:
    """He-style init for the kernel MLP (c_out=None -> depthwise)."""
    k1, k2 = jax.random.split(key)
    out_dim = c_in if c_out is None else c_in * c_out
    w1 = jax.random.normal(k1, (3, hidden), dtype) * (2.0 / 3.0) ** 0.5
    w2 = jax.random.normal(k2, (hidden, out_dim), dtype) * (2.0 / hidden) ** 0.5
    return MCConvParams(
        w1=w1,
        b1=jnp.zeros((hidden,), dtype),
        w2=w2,
        b2=jnp.zeros((out_dim,), dtype),
    )


def _conv_chunk(
    params: MCConvParams,
    samples: Array,  # (m, 3)
    nbr_idx: Array,  # (m, K)
    nbr_mask: Array,  # (m, K)
    inv_count: Array,  # (m,)
    source_pts: Array,  # (N, 3)
    weighted_feats: Array,  # (N, C)  == features / pdf
    radius: Array,
    c_out: int | None,
) -> Array:
    """Bilinearly factorized MC-conv chunk.

    Naively, ``out = sum_k (h_k @ W2 + b2) * f_k`` materializes a per-neighbor
    weight tensor of size (m, K, C[, Cout]) — on TPU that is the dominant HBM
    traffic (and for the full conv a multi-GB intermediate XLA cannot fuse
    away). Since the expression is bilinear in (hidden activations h, gathered
    features f), we contract over the neighbor axis FIRST:

      G[m, h', c] = sum_k A[m, k, h'] * f[m, k, c],   A = [relu(off@W1+b1), 1]*mask

    and only then apply (W2, b2) — shrinking the big intermediate from
    (m, K, C*Cout) to (m, (H+1), C) and turning the rest into small matmuls.
    Exact same math, orders of magnitude less memory."""
    offsets = (source_pts[nbr_idx] - samples[:, None, :]) / radius  # (m,K,3)
    h = jax.nn.relu(offsets @ params.w1 + params.b1)  # (m,K,H)
    f = weighted_feats[nbr_idx]  # (m,K,C)
    m = nbr_mask.astype(f.dtype)
    A = jnp.concatenate([h, jnp.ones_like(h[..., :1])], axis=-1) * m[..., None]
    G = jnp.einsum("mkh,mkc->mhc", A, f)  # (m,H+1,C)
    c_in = f.shape[-1]
    H = params.w1.shape[-1]
    if c_out is None:
        # depthwise: w2 (H, C), b2 (C)
        out = jnp.einsum("mhc,hc->mc", G[:, :H, :], params.w2) + G[:, H, :] * params.b2
    else:
        w2 = params.w2.reshape(H, c_in, c_out)
        b2 = params.b2.reshape(c_in, c_out)
        out = jnp.einsum("mhc,hco->mo", G[:, :H, :], w2) + G[:, H, :] @ b2
    return out * inv_count[:, None]


def mc_conv(
    params: MCConvParams,
    sample_pts: Array,  # (B, M, 3)
    neighborhood: Neighborhood,  # over (B, M) queries into (B, N) sources
    source_pts: Array,  # (B, N, 3)
    features: Array,  # (B, N, Cin)
    pdf: Array,  # (B, N)
    *,
    c_out: int | None = None,
    mean_normalize: bool = False,
    sample_chunk: int | None = None,
) -> Array:
    """Monte-Carlo conv from N source points onto M sample points.

    Returns ``(B, M, Cin)`` (depthwise, ``c_out=None``) or ``(B, M, c_out)``.
    Works for down-sampling (M < N), same-level (samples == sources) and
    up-sampling decoder convs (M > N) exactly like the reference's
    level-agnostic ``create_convolution`` (SURVEY §3.4).
    """
    B, M, _ = sample_pts.shape
    radius = jnp.asarray(neighborhood.radius, features.dtype)
    if mean_normalize:
        kept = jnp.sum(neighborhood.mask, axis=-1).astype(features.dtype)
        inv_count = 1.0 / jnp.maximum(kept, 1.0)
    else:
        inv_count = jnp.ones(neighborhood.mask.shape[:-1], features.dtype)
    weighted = features / pdf[..., None]

    if sample_chunk is None:
        K = neighborhood.idx.shape[-1]
        C = features.shape[-1]
        budget = 2**22
        per_row = K * max(C, 1)
        sample_chunk = M if M * per_row <= budget else max(1, budget // per_row)

    def per_cloud(s, idx, nmask, invc, src, wf):
        if sample_chunk >= M:
            return _conv_chunk(params, s, idx, nmask, invc, src, wf, radius, c_out)
        pad = (-M) % sample_chunk
        sp = jnp.pad(s, ((0, pad), (0, 0)))
        ip = jnp.pad(idx, ((0, pad), (0, 0)))
        mp = jnp.pad(nmask, ((0, pad), (0, 0)))
        cp = jnp.pad(invc, ((0, pad),))
        n_chunks = (M + pad) // sample_chunk
        out = jax.lax.map(
            lambda a: _conv_chunk(
                params, a[0], a[1], a[2], a[3], src, wf, radius, c_out
            ),
            (
                sp.reshape(n_chunks, sample_chunk, 3),
                ip.reshape(n_chunks, sample_chunk, -1),
                mp.reshape(n_chunks, sample_chunk, -1),
                cp.reshape(n_chunks, sample_chunk),
            ),
        )
        return out.reshape(-1, out.shape[-1])[:M]

    return jax.vmap(per_cloud)(
        sample_pts,
        neighborhood.idx,
        neighborhood.mask,
        inv_count,
        source_pts,
        weighted,
    )
