import numpy as np
import jax
import jax.numpy as jnp

from mccnn_tpu.api import SpatialCache, build_hierarchy, default_level_caps


def cloud(rng, B=2, N=128):
    pts = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    mask[:, -10:] = False
    return jnp.asarray(pts), jnp.asarray(mask)


def test_levels_shrink_and_masks_wellformed(rng):
    pts, mask = cloud(rng)
    hier = build_hierarchy(pts, mask, (0.15, 0.4), global_level=True)
    assert len(hier) == 4
    counts = [int(l.mask.sum()) for l in hier.levels]
    assert counts[0] > counts[1] > counts[2] >= counts[3] == 2  # B=2 global pts
    # sampled points are a subset of the previous level
    for lvl in (1, 2):
        prev = np.asarray(hier.levels[lvl - 1].points)
        cur = np.asarray(hier.levels[lvl].points)
        m = np.asarray(hier.levels[lvl].mask)
        for b in range(2):
            for p in cur[b][m[b]]:
                d = np.linalg.norm(prev[b] - p, axis=-1).min()
                assert d < 1e-6


def test_global_level_is_centroid(rng):
    pts, mask = cloud(rng, B=1)
    hier = build_hierarchy(pts, mask, (0.3,), global_level=True)
    g = np.asarray(hier.levels[-1].points)[0, 0]
    m = np.asarray(mask)[0]
    # centroid of the *level below* (the sampled level), not level 0
    lvl = hier.levels[-2]
    sel = np.asarray(lvl.points)[0][np.asarray(lvl.mask)[0]]
    np.testing.assert_allclose(g, sel.mean(0), atol=1e-5)


def test_hierarchy_jittable(rng):
    pts, mask = cloud(rng, B=1, N=64)

    @jax.jit
    def f(p, m):
        h = build_hierarchy(p, m, (0.2,), global_level=True)
        return h.levels[1].points, h.levels[1].mask

    p1, m1 = f(pts, mask)
    assert p1.shape[0] == 1 and m1.dtype == jnp.bool_


def test_default_level_caps():
    caps = default_level_caps(1024, [0.1, 0.4])
    assert caps[0] <= 1024 and caps[1] <= caps[0]
    assert all(c % 8 == 0 for c in caps)


def test_spatial_cache_reuses(rng):
    pts, mask = cloud(rng, B=1, N=64)
    hier = build_hierarchy(pts, mask, (0.2,))
    cache = SpatialCache(hier)
    a = cache.neighborhood(0, 1, 0.3)
    b = cache.neighborhood(0, 1, 0.3)
    assert a is b
    c = cache.neighborhood(0, 1, 0.4)
    assert c is not a
    p1 = cache.pdf(0, 0.3)
    p2 = cache.pdf(0, 0.3)
    assert p1 is p2
