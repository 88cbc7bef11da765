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


def test_scannet_whole_scene_prediction(tmp_path):
    """Sliding-block whole-scene inference (the reference's scene eval)."""
    import numpy as np
    from mccnn_tpu.tasks import scannet

    args = [
        "--synthetic", "--epochs", "1", "--batch", "4", "--points", "128",
        "--grow", "8", "--steps-per-epoch", "2", "--blocks-per-epoch", "8",
        "--ckpt-dir", str(tmp_path / "ck"), "--log-dir", str(tmp_path / "lg"),
    ]
    p = scannet.base_parser("t")
    # reuse main() for training, then call predict_scene directly
    scannet.main(args)

    # rebuild a runner via eval-only path pieces: simplest — fresh tiny run
    rng = np.random.default_rng(0)
    src = scannet.SyntheticSceneSource(2, 5, 0)
    from mccnn_tpu.models import MCSeg
    from mccnn_tpu.tasks.common import Runner
    from mccnn_tpu.train import masked_accuracy, segmentation_loss

    class A:  # minimal args carrier
        pass

    a = A()
    for k, v in dict(
        batch=4, points=128, lr=1e-3, lr_decay_steps=1000, lr_decay_rate=0.7,
        weight_decay=0.0, grad_clip=None, seed=0, ckpt_dir=str(tmp_path / "ck2"),
        log_dir=str(tmp_path / "lg2"), run_name=None, resume=False,
        eval_only=False, steps_per_epoch=1, profile_dir=None,
    ).items():
        setattr(a, k, v)
    model = MCSeg(n_classes=5, grow=8, radii=(0.2, 0.4), neighbor_k=8)
    example = next(src.batches(4, 128, rng))

    def loss_fn(lg, b):
        return segmentation_loss(lg, b["labels"], b["mask"]), {}

    runner = Runner(a, model, loss_fn, example, "scene_eval_test")
    scene = src._src.scenes[0]
    pred = scannet.predict_scene(runner, scene, 128, 4, block_size=2.0, stride=1.5)
    assert pred.shape == (len(scene),)
    assert pred.min() >= 0 and pred.max() < 5
    runner.close()


def test_train_step_deterministic(tmp_path):
    """Same seed + same data => identical losses (SURVEY §5.2 determinism —
    the whole training step, not just kernel grads)."""
    from mccnn_tpu.tasks import modelnet

    a = run(modelnet, ["--model", "MCClassS", "--seed", "7"], tmp_path / "a")
    b = run(modelnet, ["--model", "MCClassS", "--seed", "7"], tmp_path / "b")
    assert a["best_accuracy"] == b["best_accuracy"]


def test_eval_ragged_final_batch(tmp_path):
    """A final eval batch smaller than the 8-device mesh must be padded
    internally and sliced back — not crash shard_batch's divisibility check
    (ADVICE r1 medium; real ModelNet40 test split is 2468 % 32 = 4)."""
    import numpy as np
    from mccnn_tpu.tasks import modelnet
    from mccnn_tpu.tasks.common import Runner, base_parser

    args = base_parser("t").parse_args(
        [
            "--batch", "8", "--points", "64", "--grow", "8",
            "--ckpt-dir", str(tmp_path / "ck"),
            "--log-dir", str(tmp_path / "lg"),
        ]
    )
    n_classes = 6
    train_src = modelnet.SyntheticSource(16, n_classes, 0)
    test_src = modelnet.SyntheticSource(20, n_classes, 1)  # 20 % 8 = 4 ragged
    model = modelnet.build_model("MCClassS", n_classes, 8)
    example = next(train_src.batches(8, 64, np.random.default_rng(0)))
    runner = Runner(
        args, model, modelnet.make_loss("MCClassS"), example, "ragged"
    )
    assert runner.mesh.devices.size == 8
    res = modelnet.evaluate(
        runner, test_src, args, votes=1, rng=np.random.default_rng(0)
    )
    assert 0.0 <= res["accuracy"] <= 1.0
    runner.close()


def test_scannet_spatial_shards(tmp_path):
    """Whole-scene spatially-sharded training path (--spatial-shards) on the
    8-device CPU mesh: loss finite, accuracy sane, no halo overflow."""
    from mccnn_tpu.tasks import scannet

    res = scannet.main(
        [
            "--synthetic", "--spatial-shards", "8", "--points", "4096",
            "--epochs", "2", "--steps-per-epoch", "2", "--grow", "8",
            "--log-dir", str(tmp_path / "lg"),
        ]
    )
    assert np.isfinite(res["loss"])
    assert 0.0 <= res["point_accuracy"] <= 1.0
    assert res["shards"] == 8


def test_scannet_dp_spatial_composed_cli(tmp_path):
    """--data-shards D composes data parallelism with --spatial-shards S on a
    ('data', 'spatial') 2-D mesh (parallel/dp_spatial.py)."""
    from mccnn_tpu.tasks import scannet

    res = scannet.main(
        [
            "--synthetic", "--spatial-shards", "4", "--data-shards", "2",
            "--points", "2048", "--epochs", "2", "--steps-per-epoch", "2",
            "--grow", "8", "--log-dir", str(tmp_path / "lg"), "--augment",
        ]
    )
    assert np.isfinite(res["loss"])
    assert 0.0 <= res["point_accuracy"] <= 1.0
    assert res["shards"] == 4 and res["data_shards"] == 2
    assert 0.0 <= res["mIoU"] <= 1.0  # eval on canonical geometry


def test_scannet_spatial_checkpoint_resume(tmp_path):
    """The spatial-sharded trainer has the same checkpoint/resume contract as
    the Runner path: epoch 1 snapshots to --ckpt-dir; a --resume run skips
    straight to epoch 2 and continues the step counter."""
    from mccnn_tpu.tasks import scannet

    common = [
        "--synthetic", "--spatial-shards", "4", "--points", "1024",
        "--steps-per-epoch", "2", "--grow", "8",
        "--ckpt-dir", str(tmp_path / "ck"), "--log-dir", str(tmp_path / "lg"),
    ]
    res1 = scannet.main(common + ["--epochs", "1"])
    assert res1["start_epoch"] == 0 and res1["step"] == 2

    res2 = scannet.main(common + ["--epochs", "2", "--resume"])
    assert res2["start_epoch"] == 1  # epoch 0 was NOT retrained
    assert res2["step"] == 4
    assert np.isfinite(res2["loss"])
    assert 0.0 <= res2["mIoU"] <= 1.0  # final sharded-forward eval ran

    # --eval-only restores the checkpoint and evaluates without training
    res3 = scannet.main(common + ["--epochs", "2", "--eval-only"])
    assert res3["start_epoch"] == 2 and "loss" not in res3
    np.testing.assert_allclose(res3["mIoU"], res2["mIoU"], rtol=1e-6)


def test_parity_harness_synthetic(tmp_path):
    """One-command accuracy-parity harness (VERDICT r1 #5): runs end-to-end
    on synthetic data and emits a machine-checkable verdict."""
    from mccnn_tpu.tasks import parity

    v = parity.main(
        [
            "--synthetic", "--epochs", "2", "--batch", "8", "--points", "64",
            "--grow", "8", "--steps-per-epoch", "2", "--votes", "2",
            "--eval-every", "1", "--bn-decay-steps", "50",
            "--ckpt-dir", str(tmp_path / "ck"), "--log-dir", str(tmp_path / "lg"),
        ]
    )
    assert v["proxy"] is True
    assert 0.0 <= v["accuracy"] <= 1.0
    assert isinstance(v["pass"], bool)


def test_scannet_whole_scene_tile_eval_plumbing():
    """predict_scene_tile / evaluate_whole_scenes numpy plumbing (padding,
    masking, unpadding, per-scene IoU) with a mocked runner — the tile
    kernels themselves are parity-tested in test_tile_conv.py."""
    import numpy as np
    from mccnn_tpu.tasks import scannet

    n_classes, cap = 4, 256
    rng = np.random.default_rng(0)
    scenes = [rng.uniform(0, 1, size=(n, 3)).astype(np.float32) for n in (200, 131)]
    # label = x-quartile; the mock predicts from the normalized points, so
    # predictions are perfect and mIoU must be 1.0
    def lab_of(p):
        from mccnn_tpu.data.datasets import _normalize_np
        q = _normalize_np(p)[:, 0]
        return np.clip((q * n_classes).astype(np.int32), 0, n_classes - 1)

    labels = [lab_of(s) for s in scenes]

    class MockRunner:
        def eval_logits(self, batch):
            pts, mask = batch["points"], batch["mask"]
            lab = np.clip((pts[..., 0] * n_classes).astype(np.int32), 0, n_classes - 1)
            out = np.eye(n_classes, dtype=np.float32)[lab]
            return np.where(mask[..., None], out, 0.0)

    class Src:
        pass

    src = Src()
    src.scenes, src.labels = scenes, labels

    pred = scannet.predict_scene_tile(MockRunner(), scenes[0], cap)
    assert pred.shape == (200,)
    np.testing.assert_array_equal(pred, labels[0])

    res = scannet.evaluate_whole_scenes(MockRunner(), src, cap, n_classes)
    assert res["mIoU"] == 1.0 and res["point_accuracy"] == 1.0


@pytest.mark.parametrize(
    "task,key",
    [("shapenet", "best_mIoU"), ("scannet", "best_mIoU"),
     ("normals", "best_angular_error")],
)
def test_parity_harness_other_tasks(tmp_path, task, key):
    """BASELINE configs 3-5 are one command from a verdict (VERDICT r2 #7):
    each non-ModelNet parity harness runs end-to-end on synthetic data and
    emits the machine-checkable JSON verdict."""
    from mccnn_tpu.tasks import parity

    v = parity.main(
        [
            "--task", task, "--synthetic", "--epochs", "1", "--batch", "4",
            "--points", "128", "--grow", "8", "--steps-per-epoch", "2",
            "--eval-every", "1", "--ckpt-dir", str(tmp_path / "ck"),
            "--log-dir", str(tmp_path / "lg"),
        ]
    )
    assert v["proxy"] is True
    assert key in v
    assert v["metric"] == f"{task}_parity"


def test_parity_protocol_sweep(tmp_path):
    """BASELINE config 2 as ONE verdict (VERDICT r3 #6): --sweep-protocols
    trains once and evaluates under all five sampling protocols, emitting the
    uniform number, four deltas, and a bounded-degradation pass/fail."""
    from mccnn_tpu.tasks import parity

    v = parity.main(
        [
            "--synthetic", "--epochs", "2", "--batch", "8", "--points", "64",
            "--grow", "8", "--steps-per-epoch", "2", "--votes", "2",
            "--eval-every", "1", "--model", "MCClassH",
            "--sweep-protocols", "--max-degradation", "1.0",
            "--ckpt-dir", str(tmp_path / "ck"), "--log-dir", str(tmp_path / "lg"),
        ]
    )
    assert v["metric"] == "modelnet40_protocol_robustness"
    assert set(v["deltas"]) == {"gradient", "split", "lambert", "occlusion"}
    assert 0.0 <= v["uniform_accuracy"] <= 1.0
    assert isinstance(v["pass"], bool) and v["proxy"] is True
    assert v["worst_degradation"] <= 1.0
    # occlusion rides its own gate (defaults to --max-degradation) and the
    # density-protocol worst excludes it
    assert v["max_degradation_occlusion"] == 1.0
    assert v["worst_density_degradation"] == max(
        d for k, d in v["deltas"].items() if k != "occlusion"
    )
