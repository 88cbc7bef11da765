"""End-to-end smoke tests of the task CLIs on synthetic data (tiny configs,
CPU). These exercise: dataset batching + augmentation + sampling protocols,
model init, jitted DP train step over the 8-device mesh, eval metrics,
checkpoint save/restore, and the metrics logger."""

import numpy as np
import pytest


TINY = [
    "--synthetic",
    "--epochs", "1",
    "--batch", "8",
    "--points", "64",
    "--grow", "8",
    "--steps-per-epoch", "2",
]


def run(mod, extra, tmp_path):
    args = TINY + [
        "--ckpt-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "logs"),
    ] + extra
    return mod.main(args)


def test_modelnet_mcclass_s(tmp_path):
    from mccnn_tpu.tasks import modelnet

    res = run(modelnet, ["--model", "MCClassS"], tmp_path)
    assert 0.0 <= res["best_accuracy"] <= 1.0
    assert (tmp_path / "logs").exists()


def test_modelnet_mcclass_h_with_protocol(tmp_path):
    from mccnn_tpu.tasks import modelnet

    res = run(
        modelnet, ["--model", "MCClassH", "--protocol", "gradient"], tmp_path
    )
    assert 0.0 <= res["best_accuracy"] <= 1.0


def test_modelnet_eval_voting(tmp_path):
    from mccnn_tpu.tasks import modelnet

    run(modelnet, ["--model", "MCClassS"], tmp_path)
    res = run(
        modelnet, ["--model", "MCClassS", "--eval-only", "--votes", "2"], tmp_path
    )
    assert 0.0 <= res["accuracy"] <= 1.0


def test_shapenet(tmp_path):
    from mccnn_tpu.tasks import shapenet

    res = run(shapenet, [], tmp_path)
    assert 0.0 <= res["best_mIoU"] <= 1.0


def test_scannet(tmp_path):
    from mccnn_tpu.tasks import scannet

    res = run(
        scannet,
        ["--points", "128", "--blocks-per-epoch", "16", "--batch", "4"],
        tmp_path,
    )
    assert 0.0 <= res["best_mIoU"] <= 1.0


def test_normals(tmp_path):
    from mccnn_tpu.tasks import normals

    res = run(normals, ["--model", "MCNormS"], tmp_path)
    assert 0.0 < res["best_angular_error"] <= 90.0


def test_resume_round_trip(tmp_path):
    from mccnn_tpu.tasks import modelnet

    run(modelnet, ["--model", "MCClassS"], tmp_path)
    res = run(modelnet, ["--model", "MCClassS", "--resume"], tmp_path)
    assert 0.0 <= res["best_accuracy"] <= 1.0
