"""Run a serving bundle (``.mcb``) over point-cloud files.

The deployment complement of ``tasks.export``: no model code, flax, or
checkpoint is needed — only the bundle and a JAX runtime. Clouds are
normalized to the unit cube (the zoo-wide input contract, matching the
training pipeline's ``data.datasets._normalize_np``), resampled to the
exported point count, and batched to the exported batch size; ragged
request sizes ride the bundle's static-shape padding. Usage::

    python -m mccnn_tpu.tasks.predict --bundle modelnet.mcb chair.txt *.ply
    python -m mccnn_tpu.tasks.predict --bundle seg.mcb scene.ply --out-dir viz

Outputs one JSON line per input file; segmentation/normal bundles
additionally write colored ``.ply`` visualizations when ``--out-dir`` is
given (reference: SURVEY §2.2 PyUtils saves the same artifacts from its
eval scripts).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from .. import serve
from ..data.datasets import _normalize_np, pad_points
from ..utils import io as pcio


def read_cloud(path: str) -> np.ndarray:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        v = pcio.read_ply(path)
        return np.stack(
            [v["x"], v["y"], v["z"]], axis=-1
        ).astype(np.float32)
    if ext == ".npz":
        with np.load(path) as z:
            return np.asarray(z["points"], np.float32)
    return np.asarray(pcio.read_points_txt(path)[:, :3], np.float32)


def _exported_points(bundle: serve.LoadedBundle) -> int:
    flags = bundle.manifest.get("flags", {})
    if "points" in flags:
        return int(flags["points"])
    for a in bundle.exported.in_avals:  # (B, N, 3) positions entry
        if len(a.shape) == 3 and a.shape[-1] == 3:
            return int(a.shape[1])
    raise ValueError("cannot infer exported point count from the bundle")


def _make_batch(
    clouds: list[np.ndarray], bundle: serve.LoadedBundle, category: int = 0
) -> dict:
    flags = bundle.manifest.get("flags", {})
    batch = {
        "points": np.stack(clouds),
        "mask": np.ones((len(clouds), clouds[0].shape[0]), bool),
    }
    if flags.get("features_dim"):
        batch["features"] = np.ones(
            (len(clouds), clouds[0].shape[0], int(flags["features_dim"])),
            np.float32,
        )
    if flags.get("n_categories"):
        n_cat = int(flags["n_categories"])
        if not 0 <= category < n_cat:
            raise ValueError(
                f"--category {category} out of range for this bundle "
                f"(exported with {n_cat} categories)"
            )
        onehot = np.zeros((len(clouds), n_cat), np.float32)
        onehot[:, category] = 1.0
        batch["category_onehot"] = onehot
    return batch


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("inputs", nargs="+", help="point-cloud files (txt/ply/npz)")
    p.add_argument("--bundle", required=True)
    p.add_argument("--out", default=None, help="JSONL output (default stdout)")
    p.add_argument("--out-dir", default=None, help="write .ply visualizations")
    p.add_argument(
        "--cache-dir", default=None, help="persistent XLA compile cache"
    )
    p.add_argument(
        "--no-normalize",
        action="store_true",
        help="inputs are already in the unit cube",
    )
    p.add_argument(
        "--category",
        type=int,
        default=0,
        help="object-category index for category-conditioned bundles "
        "(e.g. ShapeNet MCSeg); applies to ALL input files",
    )
    p.add_argument("--seed", type=int, default=0, help="resampling seed")
    args = p.parse_args(argv)

    bundle = serve.load_bundle(args.bundle, cache_dir=args.cache_dir)
    model_kind = bundle.manifest.get("model", "")
    n_points = _exported_points(bundle)
    rng = np.random.default_rng(args.seed)

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    sink = open(args.out, "w") if args.out else None
    records = []
    try:
        for start in range(0, len(args.inputs), bundle.batch_size):
            files = args.inputs[start : start + bundle.batch_size]
            clouds = []
            for f in files:
                pts = read_cloud(f)
                if not args.no_normalize:
                    pts = _normalize_np(pts)
                pts, _, _ = pad_points(pts, n_points, rng)
                clouds.append(pts)
            out = bundle.predict(
                _make_batch(clouds, bundle, category=args.category)
            )
            if isinstance(out, (tuple, list)):
                # MCClassH returns (joint, path_a, path_b) logits; the
                # joint head is the deployment output (tasks/modelnet.py
                # `_logits` does the same for eval).
                out = out[0]
            out = np.asarray(out)

            for i, f in enumerate(files):
                rec = {"file": f, "model": model_kind}
                stem = os.path.splitext(os.path.basename(f))[0]
                if out.ndim == 2:  # classification logits (B, n_classes)
                    probs = np.exp(out[i] - out[i].max())
                    probs /= probs.sum()
                    order = np.argsort(probs)[::-1][:5]
                    rec["label"] = int(order[0])
                    rec["prob"] = float(probs[order[0]])
                    rec["top5"] = [
                        [int(c), float(probs[c])] for c in order
                    ]
                elif model_kind.startswith("MCNorm"):  # (B, N, 3) normals
                    n = out[i] / np.maximum(
                        np.linalg.norm(out[i], axis=-1, keepdims=True), 1e-9
                    )
                    rec["mean_abs_nz"] = float(np.mean(np.abs(n[:, 2])))
                    if args.out_dir:
                        dst = os.path.join(args.out_dir, f"{stem}_normals.ply")
                        pcio.save_normals_ply(dst, clouds[i], n)
                        rec["ply"] = dst
                else:  # per-point logits (B, N, C)
                    labels = out[i].argmax(-1)
                    binc = np.bincount(labels, minlength=out.shape[-1])
                    rec["label_hist"] = binc.tolist()
                    rec["dominant_label"] = int(binc.argmax())
                    if args.out_dir:
                        dst = os.path.join(args.out_dir, f"{stem}_seg.ply")
                        pcio.save_segmentation_ply(dst, clouds[i], labels)
                        rec["ply"] = dst
                line = json.dumps(rec)
                print(line, file=sink or None)
                records.append(rec)
    finally:
        if sink:
            sink.close()
    return records


if __name__ == "__main__":
    main()
