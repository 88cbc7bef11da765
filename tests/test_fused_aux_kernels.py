"""Interpret-mode parity for the fused KDE and Poisson-sweep kernels against
their (oracle-tested) XLA dense formulations."""

import numpy as np
import jax.numpy as jnp

from mccnn_tpu.core import grid as gridmod
from mccnn_tpu.core.pdf import kde_density
from mccnn_tpu.core.sampling import _SQRT3, _poisson_dense
from mccnn_tpu.ops.pallas.density_kernel import kde_density_pallas
from mccnn_tpu.ops.pallas.poisson_kernel import poisson_sweep_pallas


def cloud(rng, B=2, N=200, masked=17):
    pts = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    if masked:
        mask[:, -masked:] = False
    return jnp.asarray(pts), jnp.asarray(mask)


def test_kde_kernel_parity(rng):
    pts, mask = cloud(rng)
    want = np.asarray(kde_density(pts, mask, 0.25))  # XLA dense path (CPU)
    got = np.asarray(kde_density_pallas(pts, mask, 0.25, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_kde_kernel_nontile_n(rng):
    pts, mask = cloud(rng, N=300, masked=5)
    want = np.asarray(kde_density(pts, mask, 0.2))
    got = np.asarray(kde_density_pallas(pts, mask, 0.2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _sweep_inputs(pts, mask, radius):
    cell_edge = float(radius) / _SQRT3
    res = gridmod.grid_res_for_radius(radius, cell_scale=1.0 / _SQRT3)
    coords = gridmod.cell_coords(pts, cell_edge, res)
    cids = gridmod.linear_cell_ids(coords, res)
    colors = gridmod.cell_color27(coords)
    return cids, colors


def test_poisson_sweep_parity(rng):
    pts, mask = cloud(rng)
    radius = 0.18
    cids, colors = _sweep_inputs(pts, mask, radius)
    want = np.asarray(_poisson_dense(pts, mask, cids, colors, radius) & mask)
    got = np.asarray(
        poisson_sweep_pallas(pts, mask, cids, colors, radius, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_poisson_sweep_invariants(rng):
    pts, mask = cloud(rng, B=1, N=256, masked=0)
    radius = 0.2
    cids, colors = _sweep_inputs(pts, mask, radius)
    sel = np.asarray(
        poisson_sweep_pallas(pts, mask, cids, colors, radius, interpret=True)
    )[0]
    p = np.asarray(pts)[0]
    chosen = p[sel]
    d = np.linalg.norm(chosen[:, None] - chosen[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= radius - 1e-6
    cover = np.linalg.norm(p[:, None] - chosen[None, :], axis=-1).min(-1).max()
    assert cover <= radius + 1e-6
