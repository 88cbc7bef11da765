"""Serving-bundle export/load roundtrips (mccnn_tpu/serve.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mccnn_tpu import serve
from mccnn_tpu.models import MCClassS, MCSeg

SMALL = dict(grow=8, neighbor_k=16)


def _batch(rng, B=2, N=96):
    return {
        "points": rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32),
        "mask": np.ones((B, N), bool),
    }


def _init(model, batch):
    variables = model.init(
        jax.random.PRNGKey(0), batch["points"], batch["mask"], train=False
    )
    return variables["params"], variables.get("batch_stats", {})


def test_roundtrip_exact(rng, tmp_path):
    model = MCClassS(n_classes=5, **SMALL)
    batch = _batch(rng)
    params, stats = _init(model, batch)
    exported = serve.export_predict(model, params, stats, batch)
    path = str(tmp_path / "m.mcb")
    manifest = serve.save_bundle(path, exported, manifest={"model": "MCClassS"})
    assert manifest["format_version"] == serve.FORMAT_VERSION

    bundle = serve.load_bundle(path)
    got = bundle(batch)
    want = serve.make_predict_fn(model, params, stats)(batch)
    # The deserialized program recompiles from StableHLO with its own fusion
    # choices — numerically equivalent, not bitwise.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert serve.bundle_info(path)["model"] == "MCClassS"


def test_predict_pads_small_batches(rng, tmp_path):
    model = MCClassS(n_classes=5, **SMALL)
    batch = _batch(rng, B=4)
    params, stats = _init(model, batch)
    path = str(tmp_path / "m.mcb")
    serve.save_bundle(
        path, serve.export_predict(model, params, stats, batch)
    )
    bundle = serve.load_bundle(path)
    assert bundle.batch_size == 4

    one = {k: v[:1] for k, v in batch.items()}
    got = bundle.predict(one)
    want = serve.make_predict_fn(model, params, stats)(batch)[:1]
    assert got.shape == (1, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)

    too_big = {k: np.repeat(v, 2, axis=0) for k, v in batch.items()}
    with pytest.raises(ValueError, match="exceeds the exported batch"):
        bundle.predict(too_big)


def test_wrong_shape_rejected(rng, tmp_path):
    model = MCClassS(n_classes=5, **SMALL)
    batch = _batch(rng)
    params, stats = _init(model, batch)
    path = str(tmp_path / "m.mcb")
    serve.save_bundle(path, serve.export_predict(model, params, stats, batch))
    bundle = serve.load_bundle(path)
    bad = _batch(rng, B=2, N=64)  # wrong point count: shape-checked at call
    with pytest.raises(Exception):
        bundle(bad)


def test_mcseg_with_category_onehot(rng, tmp_path):
    model = MCSeg(n_classes=4, radii=(0.1, 0.3), **SMALL)
    batch = _batch(rng)
    batch["category_onehot"] = np.eye(3, dtype=np.float32)[:2]
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["points"],
        batch["mask"],
        None,
        jnp.asarray(batch["category_onehot"]),
        train=False,
    )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    path = str(tmp_path / "seg.mcb")
    serve.save_bundle(path, serve.export_predict(model, params, stats, batch))
    got = serve.load_bundle(path)(batch)
    want = serve.make_predict_fn(model, params, stats)(batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    assert got.shape == (2, 96, 4)


def test_load_bundle_populates_compilation_cache(rng, tmp_path):
    model = MCClassS(n_classes=3, **SMALL)
    batch = _batch(rng)
    params, stats = _init(model, batch)
    path = str(tmp_path / "m.mcb")
    serve.save_bundle(path, serve.export_predict(model, params, stats, batch))

    saved = {
        k: getattr(jax.config, k)
        for k in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_entry_size_bytes",
            "jax_persistent_cache_min_compile_time_secs",
        )
    }
    try:
        cache = tmp_path / "xla_cache"
        bundle = serve.load_bundle(path, cache_dir=str(cache))
        first = np.asarray(bundle(batch))
        assert cache.is_dir() and any(cache.iterdir()), (
            "persistent compilation cache stayed empty"
        )
        # A re-load in the same process must agree (hits the cache on disk).
        again = np.asarray(serve.load_bundle(path, cache_dir=str(cache))(batch))
        np.testing.assert_array_equal(first, again)
    finally:  # cache config is process-wide: restore for later tests
        for k, v in saved.items():
            jax.config.update(k, v)


def test_bucketed_batch_bundle(rng, tmp_path):
    model = MCClassS(n_classes=5, **SMALL)
    batch = _batch(rng, B=4)
    params, stats = _init(model, batch)
    exports = [
        serve.export_predict(model, params, stats, {k: v[:b] for k, v in batch.items()})
        for b in (1, 2, 4)
    ]
    path = str(tmp_path / "buckets.mcb")
    man = serve.save_bundle(path, exports)
    assert [p["batch"] for p in man["programs"]] == [1, 2, 4]

    bundle = serve.load_bundle(path)
    assert bundle.batch_sizes == [1, 2, 4] and bundle.batch_size == 4
    want = serve.make_predict_fn(model, params, stats)(batch)
    # b=2 routes to the batch-2 program exactly; b=3 pads into the batch-4
    got2 = bundle.predict({k: v[:2] for k, v in batch.items()})
    got3 = bundle.predict({k: v[:3] for k, v in batch.items()})
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want)[:2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(got3), np.asarray(want)[:3], atol=1e-5)
    # __call__ is exact-shape: batch 3 matches no program
    with pytest.raises(ValueError, match="no exported program"):
        bundle({k: v[:3] for k, v in batch.items()})


def test_predict_cli_classification_and_seg(tmp_path):
    from mccnn_tpu.tasks.export import main as export_main
    from mccnn_tpu.tasks.predict import main as predict_main
    from mccnn_tpu.utils import io as pcio

    rng = np.random.default_rng(3)
    cls_mcb = str(tmp_path / "cls.mcb")
    export_main(
        ["--model", "MCClassS", "--n-classes", "7", "--grow", "8",
         "--batch", "2", "--points", "64", "--out", cls_mcb]
    )
    # three clouds through a batch-2 bundle: exercises grouping + padding
    files = []
    for i in range(3):
        f = str(tmp_path / f"cloud{i}.txt")
        pcio.write_points_txt(f, rng.uniform(0, 1, (100 + i, 3)))
        files.append(f)
    out = str(tmp_path / "preds.jsonl")
    recs = predict_main(files + ["--bundle", cls_mcb, "--out", out])
    assert len(recs) == 3
    assert all(0 <= r["label"] < 7 and 0 < r["prob"] <= 1 for r in recs)
    assert len(open(out).read().strip().splitlines()) == 3

    seg_mcb = str(tmp_path / "seg.mcb")
    export_main(
        ["--model", "MCSeg", "--n-classes", "4", "--grow", "8",
         "--batch", "1", "--points", "64", "--out", seg_mcb]
    )
    viz = str(tmp_path / "viz")
    recs = predict_main(
        [files[0], "--bundle", seg_mcb, "--out-dir", viz]
    )
    assert recs[0]["dominant_label"] in range(4)
    seg_ply = recs[0]["ply"]
    # the written visualization is itself a readable input
    assert pcio.read_ply(seg_ply)["x"].shape == (64,)
    recs2 = predict_main([seg_ply, "--bundle", seg_mcb])
    assert sum(recs2[0]["label_hist"]) == 64


def test_predict_cli_normals_branch(tmp_path):
    from mccnn_tpu.tasks.export import main as export_main
    from mccnn_tpu.tasks.predict import main as predict_main
    from mccnn_tpu.utils import io as pcio

    rng = np.random.default_rng(5)
    mcb = str(tmp_path / "n.mcb")
    export_main(
        ["--model", "MCNormS", "--grow", "8", "--batch", "1",
         "--points", "64", "--out", mcb]
    )
    f = str(tmp_path / "cloud.txt")
    pcio.write_points_txt(f, rng.uniform(0, 1, (70, 3)))
    viz = str(tmp_path / "viz")
    recs = predict_main([f, "--bundle", mcb, "--out-dir", viz])
    assert 0.0 <= recs[0]["mean_abs_nz"] <= 1.0
    ply = pcio.read_ply(recs[0]["ply"])
    assert ply["x"].shape == (64,) and "nx" in ply


def test_predict_cli_mcclassh_joint_head(tmp_path):
    """MCClassH bundles output a (joint, path_a, path_b) tuple; the CLI must
    classify from the joint head, not misroute to the seg branch."""
    from mccnn_tpu.tasks.export import main as export_main
    from mccnn_tpu.tasks.predict import main as predict_main
    from mccnn_tpu.utils import io as pcio

    rng = np.random.default_rng(4)
    mcb = str(tmp_path / "h.mcb")
    export_main(
        ["--model", "MCClassH", "--n-classes", "6", "--grow", "8",
         "--batch", "2", "--points", "64", "--out", mcb]
    )
    f = str(tmp_path / "cloud.txt")
    pcio.write_points_txt(f, rng.uniform(0, 1, (80, 3)))
    recs = predict_main([f, "--bundle", mcb])
    assert recs[0]["label"] in range(6)
    assert len(recs[0]["top5"]) == 5 and 0 < recs[0]["prob"] <= 1


def test_export_cli_roundtrip(tmp_path):
    from mccnn_tpu.tasks.export import main

    out = str(tmp_path / "cli.mcb")
    rc = main(
        [
            "--model", "MCClassS", "--n-classes", "7",
            "--grow", "8", "--batch", "2", "--points", "64",
            "--out", out, "--check",
        ]
    )
    assert rc == 0
    info = serve.bundle_info(out)
    assert info["model"] == "MCClassS" and info["trained"] is False
    assert serve.load_bundle(out).batch_size == 2


def test_export_cli_whole_scene_tile_bundle(tmp_path):
    """--tile-pairs exports a whole-scene MCSeg bundle: the z-order tile
    sampler/KDE are baked into one serving program (one pass per scene, no
    sliding blocks) and the manifest records the capacity."""
    import numpy as np

    from mccnn_tpu.tasks.export import main

    out = str(tmp_path / "scene.mcb")
    rc = main(
        [
            "--model", "MCSeg", "--n-classes", "5", "--grow", "8",
            "--batch", "1", "--points", "512", "--radii", "0.1,0.3",
            "--tile-pairs", "4096", "--out", out, "--check",
        ]
    )
    assert rc == 0
    info = serve.bundle_info(out)
    assert info["model"] == "MCSeg"
    assert info["flags"]["tile_pairs"] == 4096
    assert info["flags"]["radii"] == "0.1,0.3"

    bundle = serve.load_bundle(out)
    rng = np.random.default_rng(0)
    batch = {
        "points": rng.uniform(0, 1, (1, 512, 3)).astype(np.float32),
        "mask": np.ones((1, 512), bool),
    }
    logits = np.asarray(bundle.predict(batch))
    assert logits.shape == (1, 512, 5)
    assert np.isfinite(logits).all()
