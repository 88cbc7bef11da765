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
