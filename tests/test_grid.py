import numpy as np
import jax.numpy as jnp

from mccnn_tpu.core import grid


def make_cloud(rng, B=2, N=64):
    pts = rng.uniform(-2.0, 3.0, size=(B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, N - 5 :] = False
    return jnp.asarray(pts), jnp.asarray(mask)


def test_aabb_masked(rng):
    pts, mask = make_cloud(rng)
    # poison padded entries to verify they are ignored
    pts = pts.at[:, -5:, :].set(1e6)
    mn, mx = grid.compute_aabb(pts, mask)
    ref = np.asarray(pts)[:, :-5]
    np.testing.assert_allclose(np.asarray(mn), ref.min(1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mx), ref.max(1), rtol=1e-6)


def test_aabb_fully_masked():
    pts = jnp.ones((1, 4, 3))
    mask = jnp.zeros((1, 4), bool)
    mn, mx = grid.compute_aabb(pts, mask)
    assert np.all(np.asarray(mn) == 0) and np.all(np.asarray(mx) == 0)


def test_normalize_scale_inv(rng):
    pts, mask = make_cloud(rng)
    normed, mn, scale = grid.normalize_to_unit_cube(pts, mask, scale_inv=True)
    n = np.asarray(normed)
    m = np.asarray(mask)
    assert n[m].min() >= -1e-6 and n[m].max() <= 1.0 + 1e-6
    # scale_inv: one isotropic scale per cloud -> aspect ratio preserved
    s = np.asarray(scale)
    assert np.allclose(s, s[:, :1])
    # the largest axis spans exactly [0, 1]
    spans = n[0][m[0]].max(0) - n[0][m[0]].min(0)
    assert np.isclose(spans.max(), 1.0, atol=1e-5)


def test_normalize_anisotropic(rng):
    pts, mask = make_cloud(rng)
    normed, _, _ = grid.normalize_to_unit_cube(pts, mask, scale_inv=False)
    n = np.asarray(normed)[np.asarray(mask)]
    assert np.allclose(n.max(0), 1.0, atol=1e-5)
    assert np.allclose(n.min(0), 0.0, atol=1e-5)


def test_cell_ids_round_trip(rng):
    pts = jnp.asarray(rng.uniform(0, 1, size=(1, 32, 3)).astype(np.float32))
    res = 8
    coords = grid.cell_coords(pts, 1.0 / res, res)
    c = np.asarray(coords)
    assert c.min() >= 0 and c.max() < res
    ids = np.asarray(grid.linear_cell_ids(coords, res))
    # invert
    cz = ids % res
    cy = (ids // res) % res
    cx = ids // (res * res)
    np.testing.assert_array_equal(np.stack([cx, cy, cz], -1), c)


def test_cell_color27():
    coords = jnp.asarray(
        np.stack(np.meshgrid(*[np.arange(6)] * 3, indexing="ij"), -1).reshape(1, -1, 3)
    )
    colors = np.asarray(grid.cell_color27(coords))[0]
    c = np.asarray(coords)[0]
    # same color & distinct cell -> some axis differs by >= 3 … actually every
    # differing axis differs by a multiple of 3
    assert colors.min() >= 0 and colors.max() < 27
    same = colors[:, None] == colors[None, :]
    diff = np.abs(c[:, None, :] - c[None, :, :])
    ok = np.all((diff % 3 == 0) | ~same[..., None], axis=-1)
    assert np.all(ok | ~same)


def test_grid_res_for_radius():
    assert grid.grid_res_for_radius(0.1) == 10
    assert grid.grid_res_for_radius(0.1, cell_scale=1 / 3.0**0.5) == 18
    assert grid.grid_res_for_radius(1e-9, max_res=512) == 512
