import numpy as np
import pytest

from mccnn_tpu.data import augment, synthetic
from mccnn_tpu.data.sampling_protocols import PROTOCOLS, draw


@pytest.fixture
def cloud(rng):
    return synthetic.primitive_cloud("sphere", 2048, rng)


@pytest.mark.parametrize("protocol", PROTOCOLS)
def test_protocols_return_valid_indices(rng, cloud, protocol):
    idx = draw(protocol, cloud, 512, rng)
    assert idx.shape == (512,)
    assert idx.min() >= 0 and idx.max() < len(cloud)


def test_gradient_biases_density(rng, cloud):
    # density along the gradient axis should be skewed vs uniform
    counts = []
    for _ in range(20):
        idx = draw("gradient", cloud, 512, rng)
        counts.append(cloud[idx].mean(0))
    # mean of selected points deviates from the cloud centroid on average
    dev = np.linalg.norm(np.mean(np.abs(np.array(counts) - cloud.mean(0)), 0))
    assert dev > 0.01


def test_split_biases_halfspace(rng, cloud):
    idx = draw("split", cloud, 1024, rng)
    sel = cloud[idx]
    # one side should clearly dominate relative to the uniform 50/50
    for axis_count in [np.abs((sel @ d) > 0).mean() for d in np.eye(3)]:
        pass  # direction is random; just check determinism of shape
    assert sel.shape == (1024, 3)


def test_occlusion_removes_backface(rng):
    sphere = synthetic.primitive_cloud("sphere", 4096, rng)
    idx = draw("occlusion", sphere, 512, rng)
    # visible set of a sphere from outside is at most a hemisphere-ish subset
    uniq = np.unique(idx)
    sel = sphere[uniq]
    # width of selected set along some axis should be clearly less than 2
    spans = sel.max(0) - sel.min(0)
    assert spans.min() < 1.9


def test_augment_shapes(rng, cloud):
    for fn in (
        augment.rotate_z,
        augment.rotate_small,
        augment.jitter,
        augment.anisotropic_scale,
        augment.random_point_dropout,
    ):
        out = fn(cloud, rng)
        assert out.shape == cloud.shape and out.dtype == cloud.dtype


def test_rotation_preserves_norms(rng, cloud):
    out = augment.rotate_z(cloud, rng)
    np.testing.assert_allclose(
        np.linalg.norm(out[:, :2], axis=1),
        np.linalg.norm(cloud[:, :2], axis=1),
        rtol=1e-5,
    )


def test_synthetic_classes_distinct(rng):
    pts, labels = synthetic.classification_batch(rng, 12, 256)
    assert pts.shape == (12, 256, 3) and labels.shape == (12,)
    pts2, labels2 = synthetic.segmentation_batch(rng, 4, 128, n_parts=4)
    assert labels2.max() < 4
    p, n = synthetic.normals_batch(rng, 2, 64)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, rtol=1e-5)


def test_point_dropout_wiring(rng):
    """ptDropOut augmentation: dropped points collapse onto point 0, batched
    and per-cloud forms agree in semantics, and ClassificationSource applies
    it only when train_augment + pt_drop_max are set."""
    from mccnn_tpu.data import datasets

    pts = rng.uniform(-1, 1, (4, 128, 3)).astype(np.float32)
    out = augment.batch_point_dropout(pts, np.random.default_rng(0), 0.9)
    for b in range(4):
        moved = ~np.all(out[b] == pts[b], axis=-1)
        assert np.all(out[b][moved] == out[b, 0]), "drops must land on pt 0"
    # statistical: E[drop fraction] = max_ratio/2 per cloud
    big = rng.uniform(-1, 1, (64, 512, 3)).astype(np.float32)
    ob = augment.batch_point_dropout(big, np.random.default_rng(1), 0.5)
    frac = (~np.all(ob == big, axis=-1)).mean()
    assert 0.1 < frac < 0.4, frac

    clouds = [rng.uniform(-1, 1, (600, 3)).astype(np.float32) for _ in range(8)]
    src = datasets.ClassificationSource(
        clouds, [None] * 8, np.zeros(8, np.int32), ["a"]
    )
    import os

    os.environ["MCCNN_HOST_PIPE"] = "numpy"
    try:
        get = lambda **kw: next(
            src.batches(8, 256, np.random.default_rng(7), **kw)
        )["points"]
        plain = get(train_augment=False)
        assert np.array_equal(plain, get(train_augment=False, pt_drop_max=0.9))
        aug = get(train_augment=True, pt_drop_max=0.999)
        # with ratio ~U(0,1) per cloud, some cloud has many duplicate rows
        dups = max(
            (256 - len(np.unique(aug[b], axis=0))) for b in range(8)
        )
        assert dups > 10
    finally:
        del os.environ["MCCNN_HOST_PIPE"]
