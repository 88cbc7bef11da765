import numpy as np
import jax.numpy as jnp

from mccnn_tpu.core import radius_neighbors, self_neighbors
from oracles import oracle_neighbors


def random_cloud(rng, B, N, masked=0):
    pts = rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32)
    mask = np.ones((B, N), bool)
    if masked:
        mask[:, N - masked :] = False
    return pts, mask


def check_against_oracle(pts, mask, qpts, qmask, radius, k):
    nbh = radius_neighbors(
        jnp.asarray(qpts), jnp.asarray(qmask), jnp.asarray(pts), jnp.asarray(mask), radius, k
    )
    idx, nmask, count = map(np.asarray, (nbh.idx, nbh.mask, nbh.count))
    for b in range(pts.shape[0]):
        oracle = oracle_neighbors(qpts[b], qmask[b], pts[b], mask[b], radius)
        for i, pairs in enumerate(oracle):
            assert count[b, i] == len(pairs), (b, i)
            got = set(idx[b, i][nmask[b, i]])
            want_full = [j for (_, j) in pairs]
            if len(pairs) <= k:
                assert got == set(want_full), (b, i)
            else:
                # truncation keeps the k nearest
                assert got == set(want_full[:k]), (b, i)


def test_matches_oracle_self(rng):
    pts, mask = random_cloud(rng, 2, 60, masked=7)
    check_against_oracle(pts, mask, pts, mask, 0.25, 64)


def test_truncation_keeps_nearest(rng):
    pts, mask = random_cloud(rng, 1, 80)
    check_against_oracle(pts, mask, pts, mask, 0.5, 8)


def test_cross_set_queries(rng):
    src, smask = random_cloud(rng, 2, 50, masked=5)
    q, qmask = random_cloud(rng, 2, 20, masked=3)
    check_against_oracle(src, smask, q, qmask, 0.3, 16)


def test_self_is_neighbor(rng):
    pts, mask = random_cloud(rng, 1, 30)
    nbh = self_neighbors(jnp.asarray(pts), jnp.asarray(mask), 0.05, 4)
    idx, nmask = np.asarray(nbh.idx), np.asarray(nbh.mask)
    for i in range(30):
        assert i in set(idx[0, i][nmask[0, i]])


def test_chunked_equals_unchunked(rng):
    pts, mask = random_cloud(rng, 2, 64, masked=4)
    a = radius_neighbors(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(pts), jnp.asarray(mask), 0.3, 8
    )
    b = radius_neighbors(
        jnp.asarray(pts),
        jnp.asarray(mask),
        jnp.asarray(pts),
        jnp.asarray(mask),
        0.3,
        8,
        query_chunk=17,
    )
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))


def test_permutation_invariance_of_counts(rng):
    pts, mask = random_cloud(rng, 1, 40)
    perm = rng.permutation(40)
    a = radius_neighbors(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(pts), jnp.asarray(mask), 0.3, 64
    )
    b = radius_neighbors(
        jnp.asarray(pts),
        jnp.asarray(mask),
        jnp.asarray(pts[:, perm]),
        jnp.asarray(mask[:, perm]),
        0.3,
        64,
    )
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))


def test_radius_monotonicity(rng):
    pts, mask = random_cloud(rng, 1, 50)
    j = jnp.asarray
    c1 = np.asarray(radius_neighbors(j(pts), j(mask), j(pts), j(mask), 0.1, 64).count)
    c2 = np.asarray(radius_neighbors(j(pts), j(mask), j(pts), j(mask), 0.3, 64).count)
    assert np.all(c2 >= c1)
