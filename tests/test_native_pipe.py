"""Threaded C++ batch assembly (native/hostpipe.cpp via ctypes)."""

import numpy as np
import pytest

from mccnn_tpu import native
from mccnn_tpu.data.datasets import _normalize_np

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native lib unavailable"
)


def _clouds(rng, sizes):
    return [rng.uniform(-2, 3, (n, 3)).astype(np.float32) for n in sizes]


def test_no_augment_is_a_normalized_permutation(rng):
    clouds = _clouds(rng, [200, 150])
    out = native.assemble_batch(clouds, 200, seed=1, augment=False)
    assert out.shape == (2, 200, 3)
    # n_out == n: sampling without replacement = permutation, so after the
    # unit-cube normalize the row SET matches the numpy twin exactly.
    want = _normalize_np(clouds[0])
    got = out[0]
    np.testing.assert_allclose(
        np.sort(got, axis=0), np.sort(want, axis=0), atol=1e-6
    )
    # smaller cloud: top-up with replacement — every row must come from the
    # normalized source set
    want1 = _normalize_np(clouds[1])
    d = np.abs(out[1][:, None, :] - want1[None, :, :]).max(-1).min(1)
    assert d.max() < 1e-6


def test_deterministic_and_thread_invariant(rng):
    clouds = _clouds(rng, [300, 300, 128, 512])
    a = native.assemble_batch(clouds, 256, seed=7, augment=True, threads=1)
    b = native.assemble_batch(clouds, 256, seed=7, augment=True, threads=4)
    np.testing.assert_array_equal(a, b)
    c = native.assemble_batch(clouds, 256, seed=8, augment=True)
    assert np.abs(a - c).max() > 1e-3  # different seed, different batch


def test_augmented_output_in_unit_cube(rng):
    clouds = _clouds(rng, [400] * 3)
    out = native.assemble_batch(clouds, 256, seed=3, augment=True)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6
    for b in range(3):  # normalize is tight: both extremes touched
        assert out[b].min() < 1e-5 and out[b].max() > 1 - 1e-5


def test_rotation_preserves_xy_radii(rng):
    """With only rotate-z enabled (no jitter/scale), pairwise distances are
    preserved — check via the normalized cloud's sorted pairwise-distance
    signature vs the no-augment one."""
    cloud = rng.uniform(0, 1, (128, 3)).astype(np.float32)
    lib_out = [
        native.assemble_batch(
            [cloud], 128, seed=5, augment=a,
            jitter_sigma=0.0, jitter_clip=0.0, scale_lo=1.0, scale_hi=1.0,
        )[0]
        for a in (False, True)
    ]

    def dist_sig(p):
        d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
        return np.sort(d.ravel())

    # rotation + renormalize keeps relative geometry (same scale: the
    # rotated AABB may differ, so compare shape up to the normalize factor)
    s0, s1 = dist_sig(lib_out[0]), dist_sig(lib_out[1])
    ratio = s1[s0 > 0.1] / s0[s0 > 0.1]
    assert ratio.std() / ratio.mean() < 1e-3


def test_return_idx_reconstructs_points_exactly(rng):
    clouds = _clouds(rng, [300, 80])
    pts, idx = native.assemble_batch(
        clouds, 128, seed=11, augment=False, return_idx=True
    )
    assert idx.shape == (2, 128)
    for b in range(2):
        n = len(clouds[b])
        assert (idx[b] >= 0).all() and (idx[b] < n).all()
        if n >= 128:  # without replacement
            assert len(np.unique(idx[b])) == 128
        np.testing.assert_allclose(
            pts[b], _normalize_np(clouds[b][idx[b]]), atol=1e-6
        )


def test_partseg_batches_native_labels_follow_points(rng, monkeypatch):
    from mccnn_tpu.data.datasets import PartSegSource

    clouds = _clouds(rng, [200] * 4)
    # label = x-octant of the point, so a correct gather is checkable from
    # the (un-augmented) output geometry
    labels = [(c[:, 0] > c[:, 0].mean()).astype(np.int32) for c in clouds]
    src = PartSegSource(
        clouds=[_normalize_np(c) for c in clouds],
        point_labels=labels,
        categories=np.zeros(4, np.int32),
        n_categories=1,
        n_parts=2,
    )
    b = next(src.batches(4, 64, np.random.default_rng(0)))
    assert b["points"].shape == (4, 64, 3)
    assert b["labels"].shape == (4, 64)
    assert set(np.unique(b["labels"])) <= {0, 1}
    assert b["category_onehot"].shape == (4, 1)
    # replay the batches() RNG stream to recover the exact native call and
    # check labels were gathered with the SAME rows as the points
    g = np.random.default_rng(0)
    order = np.arange(4)
    g.shuffle(order)
    seed = int(g.integers(2**63))
    pts, idx = native.assemble_batch(
        [src.clouds[i] for i in order], 64, seed=seed,
        rotate=False, jitter=False, scale=False, return_idx=True,
    )
    np.testing.assert_array_equal(b["points"], pts)
    want_labels = np.stack(
        [labels[i][idx[k]] for k, i in enumerate(order)]
    )
    np.testing.assert_array_equal(b["labels"], want_labels)


def test_extract_blocks_columns_and_labels(rng):
    # one dense scene: points live in [0,4]^2 x [0,1]
    scene = rng.uniform(0, 4, (5000, 3)).astype(np.float32)
    scene[:, 2] /= 4.0
    pts, idx, mask = native.extract_blocks(
        [scene, scene], 256, block_size=1.0, seed=9, augment=False
    )
    assert pts.shape == (2, 256, 3) and mask.all()
    for b in range(2):
        rows = scene[idx[b]]
        # all chosen rows lie in ONE 1.0-wide xy column
        assert rows[:, 0].max() - rows[:, 0].min() <= 1.0 + 1e-6
        assert rows[:, 1].max() - rows[:, 1].min() <= 1.0 + 1e-6
        # output is the normalized gather of those rows
        np.testing.assert_allclose(
            pts[b], _normalize_np(rows), atol=1e-6
        )
    # determinism + seed sensitivity
    again = native.extract_blocks(
        [scene, scene], 256, block_size=1.0, seed=9, augment=False
    )
    np.testing.assert_array_equal(idx, again[1])
    other = native.extract_blocks(
        [scene, scene], 256, block_size=1.0, seed=10, augment=False
    )
    assert (idx != other[1]).any()


def test_scene_batches_native_matches_replayed_call(rng):
    from mccnn_tpu.data.datasets import SceneSegSource

    scenes = [rng.uniform(0, 3, (3000, 3)).astype(np.float32) for _ in range(2)]
    labels = [rng.integers(0, 5, size=3000).astype(np.int32) for _ in range(2)]
    src = SceneSegSource(scenes=scenes, labels=labels, n_classes=5,
                         block_size=1.5)
    b = next(src.batches(2, 128, np.random.default_rng(0)))
    assert b["points"].shape == (2, 128, 3)
    assert b["labels"].shape == (2, 128) and b["mask"].all()
    # labels gathered with the same rows as the points (replay the stream)
    g = np.random.default_rng(0)
    chunk = g.integers(0, 2, size=2)
    seed = int(g.integers(2**63))
    pts, idx, _ = native.extract_blocks(
        [scenes[si] for si in chunk], 128, 1.5, seed=seed, augment=False
    )
    np.testing.assert_array_equal(b["points"], pts)
    want = np.stack([labels[si][idx[k]] for k, si in enumerate(chunk)])
    np.testing.assert_array_equal(b["labels"], want)


def test_batches_native_path_and_numpy_fallback(rng, monkeypatch):
    from mccnn_tpu.data.datasets import ClassificationSource

    clouds = _clouds(rng, [300] * 5)
    src = ClassificationSource(
        clouds=[_normalize_np(c) for c in clouds],
        normals=[None] * 5,
        labels=np.arange(5, dtype=np.int32),
        class_names=[str(i) for i in range(5)],
    )
    b_native = next(
        src.batches(4, 128, np.random.default_rng(0), train_augment=True)
    )
    monkeypatch.setenv("MCCNN_HOST_PIPE", "numpy")
    b_numpy = next(
        src.batches(4, 128, np.random.default_rng(0), train_augment=True)
    )
    for b in (b_native, b_numpy):
        assert b["points"].shape == (4, 128, 3)
        assert b["points"].min() >= 0 and b["points"].max() <= 1 + 1e-6
        assert b["mask"].all()
    np.testing.assert_array_equal(b_native["labels"], b_numpy["labels"])
