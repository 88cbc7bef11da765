import numpy as np
import jax.numpy as jnp

from mccnn_tpu.core import kde_density
from oracles import oracle_kde


def test_matches_oracle(rng):
    B, N = 2, 60
    pts = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, -6:] = False
    radius, win = 0.25, 0.25
    d = np.asarray(kde_density(jnp.asarray(pts), jnp.asarray(mask), radius, kde_window=win, k=N))
    for b in range(B):
        ref = oracle_kde(pts[b], mask[b], radius, win)
        np.testing.assert_allclose(d[b], ref, rtol=2e-4)


def test_masked_points_get_one(rng):
    pts = rng.uniform(0, 1, size=(1, 20, 3)).astype(np.float32)
    mask = np.ones((1, 20), bool)
    mask[0, 10:] = False
    d = np.asarray(kde_density(jnp.asarray(pts), jnp.asarray(mask), 0.2, k=20))
    assert np.all(d[0, 10:] == 1.0)


def test_density_scales_with_clustering(rng):
    # Within one neighborhood, points in a tight cluster must report much
    # higher density than points on a sparse shell of the same neighborhood.
    # (Absolute KDE values are normalized per-ball, so the meaningful signal
    # is the relative density p(y|x) across y — exactly what the 1/pdf
    # correction consumes.)
    cluster = rng.normal(0.5, 0.002, size=(25, 3))
    shell = rng.normal(size=(25, 3))
    shell = 0.5 + 0.15 * shell / np.linalg.norm(shell, axis=-1, keepdims=True)
    pts = np.concatenate([cluster, shell]).astype(np.float32)[None]
    mask = np.ones((1, 50), bool)
    d = np.asarray(kde_density(jnp.asarray(pts), jnp.asarray(mask), 0.2, k=50))
    assert d[0, :25].mean() > 5 * d[0, 25:].mean()


def test_uniform_density_near_constant_interior(rng):
    # On a dense uniform grid, interior densities should be near-equal.
    g = np.linspace(0.05, 0.95, 10)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(1, -1, 3).astype(np.float32)
    mask = np.ones((1, pts.shape[1]), bool)
    d = np.asarray(kde_density(jnp.asarray(pts), jnp.asarray(mask), 0.21, k=64))[0]
    interior = pts[0].min(-1) > 0.2
    interior &= pts[0].max(-1) < 0.8
    di = d[interior]
    assert di.std() / di.mean() < 0.05
