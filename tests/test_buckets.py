import numpy as np
import jax.numpy as jnp

from mccnn_tpu.core.buckets import (
    build_buckets,
    bucketize,
    default_cap,
    unbucketize,
)


def cloud(rng, B=2, N=200, masked=15):
    pts = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    if masked:
        mask[:, -masked:] = False
    return pts, mask


def test_round_trip(rng):
    pts, mask = cloud(rng)
    g = build_buckets(jnp.asarray(pts), jnp.asarray(mask), 0.2, cap=32)
    assert int(g.overflow.sum()) == 0
    feats = rng.normal(size=(2, 200, 5)).astype(np.float32)
    b = bucketize(g, jnp.asarray(feats))
    back = unbucketize(g, b, jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(back)[mask], feats[mask])
    assert np.all(np.asarray(back)[~mask] == 0)


def test_positions_and_sentinels(rng):
    pts, mask = cloud(rng)
    g = build_buckets(jnp.asarray(pts), jnp.asarray(mask), 0.25, cap=48)
    pos = np.asarray(g.positions)
    sm = np.asarray(g.slot_mask)
    # occupied slots hold real positions, empty slots the far sentinel
    assert np.all(pos[sm] <= 1.0 + 1e-6)
    assert np.all(pos[~sm] == 1.0e6)
    # every unmasked point occupies exactly one slot
    assert sm.sum() == mask.sum()


def test_points_land_in_their_cell(rng):
    pts, mask = cloud(rng, B=1, masked=0)
    r = 0.2
    g = build_buckets(jnp.asarray(pts), jnp.asarray(mask), r, cap=32)
    Rp = g.padded_res
    slot = np.asarray(g.slot_of_point)[0]
    cell = slot // g.cap
    cz = cell % Rp - 1
    cy = (cell // Rp) % Rp - 1
    cx = cell // (Rp * Rp) - 1
    expect = np.clip(np.floor(pts[0] / r).astype(int), 0, g.res - 1)
    np.testing.assert_array_equal(np.stack([cx, cy, cz], -1), expect)


def test_overflow_counted(rng):
    pts = np.full((1, 100, 3), 0.5, np.float32)  # all in one cell
    mask = np.ones((1, 100), bool)
    g = build_buckets(jnp.asarray(pts), jnp.asarray(mask), 0.2, cap=8)
    assert int(g.overflow[0]) == 92
    assert int(np.asarray(g.slot_mask).sum()) == 8


def test_ghost_cells_empty(rng):
    pts, mask = cloud(rng, B=1, masked=0)
    g = build_buckets(jnp.asarray(pts), jnp.asarray(mask), 0.3, cap=64)
    Rp, R, cap = g.padded_res, g.res, g.cap
    sm = np.asarray(g.slot_mask)[0, :-1].reshape(Rp, Rp, Rp, cap)
    assert not sm[0].any() and not sm[-1].any()
    assert not sm[:, 0].any() and not sm[:, -1].any()
    assert not sm[:, :, 0].any() and not sm[:, :, -1].any()


def test_default_cap():
    c = default_cap(1024, 0.1)
    assert c % 8 == 0 and 8 <= c <= 1024
