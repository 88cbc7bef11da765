"""Estimator-level property tests (SURVEY §4 + §7 'hard parts'): sampling-
protocol invariance of the density-corrected estimator, truncation behavior,
and the two normalization modes."""

import numpy as np
import jax
import jax.numpy as jnp

from mccnn_tpu.core import (
    init_mcconv_params,
    kde_density,
    mc_conv,
    radius_neighbors,
)


def test_pdf_correction_gives_protocol_invariance(rng):
    """The paper's central claim: with the 1/density correction, the conv is a
    consistent Monte-Carlo estimate of the continuous integral, so uniform vs
    heavily view-biased samplings of the SAME surface must give nearly the
    same outputs; without the correction they differ substantially."""
    n = 4000
    base = rng.normal(size=(n, 3))
    base /= np.linalg.norm(base, axis=-1, keepdims=True)  # unit sphere surface
    w = np.maximum(base @ np.array([0.0, 0.0, 1.0]), 0.05)  # view bias
    idx_uni = rng.choice(n, 2000, replace=False)
    idx_bias = rng.choice(n, 2000, replace=False, p=w / w.sum())

    params = init_mcconv_params(jax.random.PRNGKey(1), 1, None)
    radius = 0.4
    probes = base[rng.choice(n, 64, replace=False)]
    # keep probes away from the depleted pole so both samplings cover them
    probes = probes[probes[:, 2] > -0.2][:32]

    def conv_on(sample, use_pdf):
        pts = jnp.asarray(((sample + 1) / 2).astype(np.float32))[None]
        q = jnp.asarray(((probes + 1) / 2).astype(np.float32))[None]
        mask = jnp.ones((1, len(sample)), bool)
        qmask = jnp.ones((1, len(probes)), bool)
        feats = jnp.asarray((sample[:, :1] + 2.0).astype(np.float32))[None]
        pdf = (
            kde_density(pts, mask, radius)
            if use_pdf
            else jnp.ones((1, len(sample)))
        )
        nbh = radius_neighbors(q, qmask, pts, mask, radius, len(sample))
        return np.asarray(
            mc_conv(
                params, q, nbh, pts, feats, pdf, mean_normalize=not use_pdf
            )
        )[0]

    def rel(a, b):
        return float(np.abs(a - b).mean() / (np.abs(a).mean() + 1e-9))

    shift_with = rel(conv_on(base[idx_uni], True), conv_on(base[idx_bias], True))
    shift_without = rel(
        conv_on(base[idx_uni], False), conv_on(base[idx_bias], False)
    )
    # corrected estimator must be far more stable under the density shift
    assert shift_with < 0.5 * shift_without, (shift_with, shift_without)
    assert shift_with < 0.15, shift_with


def test_mean_mode_truncation_calibrated(rng):
    """usePDF=False mode: normalizing by the KEPT count keeps the truncated
    estimate magnitude-calibrated (a true-count normalization would shrink it
    by ~K/c)."""
    B, N, radius = 1, 1200, 0.3
    core = rng.normal(0.5, 0.04, size=(B, N // 2, 3))
    rest = rng.uniform(0, 1, size=(B, N - N // 2, 3))
    pts = jnp.asarray(np.clip(np.concatenate([core, rest], 1), 0, 1).astype(np.float32))
    mask = jnp.ones((B, N), bool)
    feats = jnp.asarray((np.asarray(pts)[..., :1] * 2.0 + 0.5).astype(np.float32))
    ones = jnp.ones((B, N))
    params = init_mcconv_params(jax.random.PRNGKey(0), 1, None)

    def run(k):
        nbh = radius_neighbors(pts, mask, pts, mask, radius, k)
        return np.asarray(
            mc_conv(params, pts, nbh, pts, feats, ones, mean_normalize=True)
        )

    full = run(N)
    scale = np.abs(full).mean()
    errs = {k: float(np.abs(run(k) - full).mean() / scale) for k in (16, 64, 256)}
    # monotone improvement; no magnitude collapse even at tiny K (the
    # remaining error is the spatial bias of nearest-K subsampling)
    assert errs[256] <= errs[64] <= errs[16] + 1e-9, errs
    assert errs[256] < 0.35, errs
    # magnitude calibration: the K=16 estimate's mean magnitude is within 2x
    est16 = run(16)
    ratio = np.abs(est16).mean() / scale
    # true-count normalization would give ratio ~ K/c ~ 0.03 here
    assert 0.35 < ratio < 3.0, ratio


def test_pdf_mode_magnitude_scale(rng):
    """pdf-mode outputs approximate the continuous integral over the ball —
    magnitudes should be independent of how many samples represent the same
    geometry (2x denser sampling of the same surface ~ same output)."""
    n = 3000
    base = rng.normal(size=(2 * n, 3))
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    params = init_mcconv_params(jax.random.PRNGKey(2), 1, None)
    radius = 0.4
    probes = base[:48]

    def conv_on(sample):
        pts = jnp.asarray(((sample + 1) / 2).astype(np.float32))[None]
        q = jnp.asarray(((probes + 1) / 2).astype(np.float32))[None]
        mask = jnp.ones((1, len(sample)), bool)
        qmask = jnp.ones((1, len(probes)), bool)
        feats = jnp.asarray((sample[:, :1] + 2.0).astype(np.float32))[None]
        pdf = kde_density(pts, mask, radius)
        nbh = radius_neighbors(q, qmask, pts, mask, radius, len(sample))
        return np.asarray(mc_conv(params, q, nbh, pts, feats, pdf))[0]

    half = conv_on(base[rng.choice(2 * n, n, replace=False)])
    full = conv_on(base)
    relerr = np.abs(half - full).mean() / (np.abs(full).mean() + 1e-9)
    assert relerr < 0.15, relerr
