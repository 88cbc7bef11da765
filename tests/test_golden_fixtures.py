"""Golden-fixture ingestion tests (VERDICT r2 #8): tiny checked-in dataset
trees in the REAL drop formats, parsed through the REAL loaders — so the
ingestion path is de-risked before any real corpus lands, independent of the
synthetic sources every other test uses.

Fixture layouts mirror the reference's documented drops (SURVEY §2.2
DataSet): ModelNet40 'modelnet40_normal_resampled' (csv xyz+normals),
ShapeNet-part 'shapenetcore_partanno_segmentation_benchmark_v0' (.pts +
1-based .seg + split json), and ScanNet PointNet++-style pickles converted by
tools/convert_scannet.py.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

FX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_modelnet40_loader_parses_fixture():
    from mccnn_tpu.data.datasets import load_modelnet40

    src = load_modelnet40(os.path.join(FX, "modelnet40"), "train")
    assert src.class_names == ["airplane", "chair"]
    assert list(src.labels) == [0, 1]
    assert src.clouds[0].shape == (32, 3)
    assert src.normals[0].shape == (32, 3)
    np.testing.assert_allclose(
        np.linalg.norm(src.normals[0], axis=1), 1.0, atol=1e-4
    )
    test = load_modelnet40(os.path.join(FX, "modelnet40"), "test")
    assert list(test.labels) == [1]
    # and the batch pipeline runs on it (train split: 2 clouds = 1 full batch)
    b = next(src.batches(2, 16, np.random.default_rng(0)))
    assert b["points"].shape == (2, 16, 3)
    assert b["mask"].any()


def test_shapenet_loader_parses_fixture():
    from mccnn_tpu.data.datasets import load_shapenet_part

    src = load_shapenet_part(os.path.join(FX, "shapenet"), "train")
    assert len(src.clouds) == 3
    # labels were 1-based on disk; loader must shift to 0-based
    assert min(l.min() for l in src.point_labels) == 0
    assert src.n_categories == 2
    b = next(src.batches(2, 24, np.random.default_rng(0)))
    assert b["points"].shape == (2, 24, 3)
    assert b["category_onehot"].shape[-1] == 2


def test_scannet_convert_and_load_roundtrip(tmp_path):
    """tools/convert_scannet.py on a reference-style pickle, then the npz
    loader on its output — the full ScanNet ingestion chain."""
    out = tmp_path / "scannet_train.npz"
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(os.path.dirname(__file__), "..", "tools", "convert_scannet.py"),
            os.path.join(FX, "scannet", "scannet_ref.pickle"),
            str(out),
        ],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr
    from mccnn_tpu.data.datasets import load_scannet

    src = load_scannet(str(tmp_path), "train")
    assert len(src.scenes) == 3
    assert src.n_classes == 5
    assert src.scenes[0].dtype == np.float32
    assert src.labels[0].dtype == np.int32


def test_scannet_npz_loader_parses_fixture():
    from mccnn_tpu.data.datasets import load_scannet

    src = load_scannet(os.path.join(FX, "scannet"), "test")
    assert len(src.scenes) == 3
    b = next(src.batches(2, 32, np.random.default_rng(0)))
    assert b["points"].shape == (2, 32, 3)
    assert set(b) >= {"points", "mask", "labels"}


def test_malformed_modelnet_raises(tmp_path):
    from mccnn_tpu.data.datasets import load_modelnet40

    with pytest.raises(FileNotFoundError, match="ModelNet40 not found"):
        load_modelnet40(str(tmp_path), "train")
