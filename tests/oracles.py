"""Brute-force numpy oracles for the core ops (SURVEY §4: the reference has no
test suite; the CUDA ops are GPU-only, so parity = numeric agreement with these
O(N^2) oracles + end-metric parity)."""

from __future__ import annotations

import numpy as np


def oracle_neighbors(queries, q_mask, sources, s_mask, radius):
    """Returns per-query sorted list of (distance, source_index) within radius."""
    out = []
    for i, q in enumerate(queries):
        if not q_mask[i]:
            out.append([])
            continue
        d = np.linalg.norm(sources - q, axis=-1)
        idx = np.nonzero((d <= radius) & s_mask)[0]
        pairs = sorted((float(d[j]), int(j)) for j in idx)
        out.append(pairs)
    return out


def oracle_kde(points, mask, radius, kde_window):
    """Unnormalized Gaussian-KDE sample density (points per unit volume) per
    point over its own in-radius neighborhood — see core/pdf.py."""
    h = kde_window * radius
    norm_c = 1.0 / ((h**3) * (2.0 * np.pi) ** 1.5)
    out = np.ones(len(points))
    for j, p in enumerate(points):
        if not mask[j]:
            continue
        d = np.linalg.norm(points - p, axis=-1)
        nbr = (d <= radius) & mask
        out[j] = norm_c * np.exp(-0.5 * (d[nbr] / h) ** 2).sum()
    return out


def oracle_mcconv(
    w1, b1, w2, b2, samples, s_mask, sources, features, pdf, radius,
    c_out=None, mean_normalize=False,
):
    """Dense Monte-Carlo conv (see core/mcconv.py):
    pdf mode:  out[i] = sum_j g((y_j-x_i)/r) f_j / pdf_j
    mean mode: out[i] = (1/|N(i)|) sum_j g((y_j-x_i)/r) f_j

    Uses ALL in-radius neighbors (no capacity truncation); jnp/pallas results
    match when K >= true max neighbor count.
    """
    M = len(samples)
    c_in = features.shape[-1]
    dim_out = c_in if c_out is None else c_out
    out = np.zeros((M, dim_out), np.float64)
    for i in range(M):
        if not s_mask[i]:
            continue
        d = np.linalg.norm(sources - samples[i], axis=-1)
        nbrs = np.nonzero(d <= radius)[0]
        if len(nbrs) == 0:
            continue
        acc = np.zeros(dim_out)
        for j in nbrs:
            off = (sources[j] - samples[i]) / radius
            h = np.maximum(off @ w1 + b1, 0.0)
            w = h @ w2 + b2
            fj = features[j] / pdf[j]
            if c_out is None:
                acc += w * fj
            else:
                acc += fj @ w.reshape(c_in, c_out)
        out[i] = acc / len(nbrs) if mean_normalize else acc
    return out
