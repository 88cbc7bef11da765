"""Dataset loaders: ModelNet40, ShapeNet-part, ScanNet.

Reference parity (viscom-ulm/MCCNN): ``utils/DataSet.py`` + the per-task
dataset classes (``ModelNet/ModelNetDataSet.py`` etc., SURVEY §2.2): per-model
point lists, shuffled padded batching, augmentation hooks, and the
non-uniform sampling protocols (sampling_protocols.py).

File formats follow the reference's data drops:
  * ModelNet40: ``modelnet40_normal_resampled`` — one ``<name>.txt`` per model
    with comma-separated ``x,y,z,nx,ny,nz`` rows, plus
    ``modelnet40_shape_names.txt`` and ``modelnet40_{train,test}.txt`` lists.
  * ShapeNet-part: ``shapenetcore_partanno_segmentation_benchmark_v0`` —
    per-synset ``points/*.pts`` + ``points_label/*.seg`` and the
    ``train_test_split/shuffled_*_file_list.json`` splits.
  * ScanNet: ``scannet_{train,test}.npz`` with object arrays ``scenes`` (per
    scene float32 (n,3)) and ``labels`` (per scene int32 (n,)) — converted
    from the original pickles (the reference consumed PointNet++'s pickles).

Every loader yields dense padded batches: dict(points (B,N,3) normalized to
the unit cube, mask (B,N), plus task fields). No torch/tf dependency; pure
numpy host pipeline feeding jit-compiled steps.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np

from ..core.grid import normalize_to_unit_cube  # noqa: F401  (re-export hint)
from . import augment
from .sampling_protocols import draw


def _normalize_np(points: np.ndarray) -> np.ndarray:
    """Center + scale into the unit cube (scale-invariant, aspect kept) —
    numpy twin of core.grid.normalize_to_unit_cube for the host pipeline."""
    mn, mx = points.min(0), points.max(0)
    scale = max(float((mx - mn).max()), 1e-9)
    return ((points - mn) / scale).astype(np.float32)


def pad_points(points: np.ndarray, n: int, rng: np.random.Generator):
    """Sample-with-replacement up to n (mask True) — the reference resamples
    each epoch rather than padding, so masks here are all-True for n <= len."""
    if len(points) >= n:
        idx = rng.choice(len(points), size=n, replace=False)
        return points[idx], np.ones(n, bool), idx
    idx = np.concatenate(
        [np.arange(len(points)), rng.choice(len(points), n - len(points))]
    )
    return points[idx], np.ones(n, bool), idx


@dataclass
class ClassificationSource:
    """In-memory classification dataset: full-resolution clouds + labels."""

    clouds: list  # list of (n_i, 3) float32 (normalized)
    normals: list  # list of (n_i, 3) or None
    labels: np.ndarray  # (n_models,)
    class_names: list

    def batches(
        self,
        batch_size: int,
        n_points: int,
        rng: np.random.Generator,
        *,
        shuffle: bool = True,
        train_augment: bool = False,
        protocol: str = "uniform",
        drop_remainder: bool = True,
        pt_drop_max: float = 0.0,
    ) -> Iterator[dict]:
        """``pt_drop_max`` > 0 applies the reference's ptDropOut-style
        augmentation when ``train_augment`` (a random fraction of each cloud
        collapsed onto its first point — density-robustness training; the
        reference's DataSet applies it for ModelNet, SURVEY §2.2). Applied
        after normalization, identically on both host pipelines."""
        order = np.arange(len(self.clouds))
        if shuffle:
            rng.shuffle(order)
        use_native = protocol == "uniform" and os.environ.get(
            "MCCNN_HOST_PIPE", "native"
        ) != "numpy"
        for start in range(0, len(order), batch_size):
            chunk = order[start : start + batch_size]
            if len(chunk) < batch_size and drop_remainder:
                return
            if use_native:
                # Threaded C++ assembly (sample+augment+normalize in one
                # call — native/hostpipe.cpp); falls back below if the
                # library didn't build. RNG streams differ from the numpy
                # path (both deterministic per seed).
                from .. import native

                pts = native.assemble_batch(
                    [self.clouds[i] for i in chunk],
                    n_points,
                    seed=int(rng.integers(2**63)),
                    augment=train_augment,
                )
                if pts is not None:
                    if train_augment and pt_drop_max > 0.0:
                        pts = augment.batch_point_dropout(
                            pts, rng, max_ratio=pt_drop_max
                        )
                    yield {
                        "points": pts,
                        "mask": np.ones((len(chunk), n_points), bool),
                        "labels": self.labels[chunk].astype(np.int32),
                    }
                    continue
                use_native = False
            pts_b, mask_b, lab_b = [], [], []
            for i in chunk:
                cloud = self.clouds[i]
                nrm = self.normals[i]
                idx = draw(protocol, cloud, n_points, rng, normals=nrm)
                p = cloud[idx]
                if train_augment:
                    p = augment.rotate_z(p, rng)
                    p = augment.jitter(p, rng)
                    p = augment.anisotropic_scale(p, rng)
                p = _normalize_np(p)
                if train_augment and pt_drop_max > 0.0:
                    p = augment.random_point_dropout(
                        p, rng, max_ratio=pt_drop_max
                    )
                pts_b.append(p)
                mask_b.append(np.ones(n_points, bool))
                lab_b.append(self.labels[i])
            yield {
                "points": np.stack(pts_b),
                "mask": np.stack(mask_b),
                "labels": np.asarray(lab_b, np.int32),
            }


def load_modelnet40(root: str, split: str = "train") -> ClassificationSource:
    names_file = os.path.join(root, "modelnet40_shape_names.txt")
    split_file = os.path.join(root, f"modelnet40_{split}.txt")
    if not os.path.exists(split_file):
        raise FileNotFoundError(
            f"ModelNet40 not found at {root} — expected the "
            "'modelnet40_normal_resampled' layout. Use --synthetic for smoke "
            "runs without data."
        )
    from ..utils.io import read_points_txt

    class_names = [l.strip() for l in open(names_file) if l.strip()]
    cls_index = {c: i for i, c in enumerate(class_names)}
    model_ids = [l.strip() for l in open(split_file) if l.strip()]
    clouds, normals, labels = [], [], []
    for mid in model_ids:
        cls = "_".join(mid.split("_")[:-1])
        arr = read_points_txt(os.path.join(root, cls, mid + ".txt"))
        clouds.append(np.ascontiguousarray(arr[:, :3]))
        normals.append(np.ascontiguousarray(arr[:, 3:6]) if arr.shape[1] >= 6 else None)
        labels.append(cls_index[cls])
    return ClassificationSource(
        clouds=clouds,
        normals=normals,
        labels=np.asarray(labels, np.int32),
        class_names=class_names,
    )


@dataclass
class PartSegSource:
    """ShapeNet-part: clouds + per-point part labels + per-cloud category."""

    clouds: list
    point_labels: list
    categories: np.ndarray  # (n_models,) int32
    n_categories: int
    n_parts: int

    def batches(
        self,
        batch_size: int,
        n_points: int,
        rng: np.random.Generator,
        *,
        shuffle: bool = True,
        train_augment: bool = False,
        protocol: str = "uniform",
        drop_remainder: bool = True,
    ) -> Iterator[dict]:
        order = np.arange(len(self.clouds))
        if shuffle:
            rng.shuffle(order)
        use_native = protocol == "uniform" and os.environ.get(
            "MCCNN_HOST_PIPE", "native"
        ) != "numpy"
        for start in range(0, len(order), batch_size):
            chunk = order[start : start + batch_size]
            if len(chunk) < batch_size and drop_remainder:
                return
            if use_native:
                # C++ assembly with the chosen rows returned so the
                # per-point part labels ride the same sample (no scale
                # augment here, matching the numpy path below).
                from .. import native

                res = native.assemble_batch(
                    [self.clouds[i] for i in chunk],
                    n_points,
                    seed=int(rng.integers(2**63)),
                    rotate=train_augment,
                    jitter=train_augment,
                    scale=False,
                    return_idx=True,
                )
                if res is not None:
                    pts, idx = res
                    cat = self.categories[chunk].astype(np.int32)
                    yield {
                        "points": pts,
                        "mask": np.ones((len(chunk), n_points), bool),
                        "labels": np.stack(
                            [
                                self.point_labels[i][idx[k]]
                                for k, i in enumerate(chunk)
                            ]
                        ).astype(np.int32),
                        "category_onehot": np.eye(
                            self.n_categories, dtype=np.float32
                        )[cat],
                    }
                    continue
                use_native = False
            pts_b, lab_b, cat_b = [], [], []
            for i in chunk:
                cloud = self.clouds[i]
                idx = draw(protocol, cloud, n_points, rng)
                p = cloud[idx]
                if train_augment:
                    p = augment.rotate_z(p, rng)
                    p = augment.jitter(p, rng)
                pts_b.append(_normalize_np(p))
                lab_b.append(self.point_labels[i][idx])
                cat_b.append(self.categories[i])
            cat = np.asarray(cat_b, np.int32)
            onehot = np.eye(self.n_categories, dtype=np.float32)[cat]
            yield {
                "points": np.stack(pts_b),
                "mask": np.ones((len(chunk), n_points), bool),
                "labels": np.stack(lab_b).astype(np.int32),
                "category_onehot": onehot,
            }


def load_shapenet_part(root: str, split: str = "train") -> PartSegSource:
    split_file = os.path.join(
        root, "train_test_split", f"shuffled_{split}_file_list.json"
    )
    if not os.path.exists(split_file):
        raise FileNotFoundError(
            f"ShapeNet-part not found at {root} — expected the "
            "'shapenetcore_partanno_segmentation_benchmark_v0' layout. Use "
            "--synthetic for smoke runs without data."
        )
    files = json.load(open(split_file))
    synsets = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d)) and d.isdigit()
    )
    syn_index = {s: i for i, s in enumerate(synsets)}
    clouds, labels, cats = [], [], []
    max_part = 0
    from ..native import fast_parse_ints
    from ..utils.io import read_points_txt

    for f in files:
        _, synset, mid = f.split("/")
        pts = read_points_txt(os.path.join(root, synset, "points", mid + ".pts"))
        seg = (
            fast_parse_ints(
                open(
                    os.path.join(root, synset, "points_label", mid + ".seg"), "rb"
                ).read()
            )
            - 1  # reference labels are 1-based
        ).astype(np.int32)
        clouds.append(pts)
        labels.append(seg)
        cats.append(syn_index[synset])
        max_part = max(max_part, int(seg.max()) + 1)
    return PartSegSource(
        clouds=clouds,
        point_labels=labels,
        categories=np.asarray(cats, np.int32),
        n_categories=len(synsets),
        n_parts=max_part,
    )


@dataclass
class SceneSegSource:
    """ScanNet-style scene segmentation: big scenes chopped into blocks.

    The reference chops scenes into fixed-size blocks on CPU (SURVEY §5.7);
    block extraction: random block origin in the xy plane, all points in a
    ``block_size``-wide column, padded/subsampled to ``n_points``."""

    scenes: list  # list of (n_i, 3) float32
    labels: list  # list of (n_i,) int32
    n_classes: int
    block_size: float = 1.5

    def batches(
        self,
        batch_size: int,
        n_points: int,
        rng: np.random.Generator,
        *,
        shuffle: bool = True,
        train_augment: bool = False,
        protocol: str = "uniform",
        drop_remainder: bool = True,
        blocks_per_epoch: int | None = None,
    ) -> Iterator[dict]:
        n_blocks = blocks_per_epoch or max(len(self.scenes), batch_size)
        scene_ids = rng.integers(0, len(self.scenes), size=n_blocks)
        use_native = protocol == "uniform" and os.environ.get(
            "MCCNN_HOST_PIPE", "native"
        ) != "numpy"
        for start in range(0, n_blocks, batch_size):
            chunk = scene_ids[start : start + batch_size]
            if len(chunk) < batch_size and drop_remainder:
                return
            if use_native:
                # Block select + sample + augment + normalize in one
                # threaded C++ call (native/hostpipe.cpp), labels gathered
                # from the returned scene rows.
                from .. import native

                res = native.extract_blocks(
                    [self.scenes[si] for si in chunk],
                    n_points,
                    self.block_size,
                    seed=int(rng.integers(2**63)),
                    augment=train_augment,
                )
                if res is not None:
                    pts, idx, m = res
                    yield {
                        "points": pts,
                        "mask": m,
                        "labels": np.stack(
                            [
                                self.labels[si][idx[k]]
                                for k, si in enumerate(chunk)
                            ]
                        ).astype(np.int32),
                    }
                    continue
                use_native = False
            pts_b, lab_b, mask_b = [], [], []
            for si in chunk:
                pts, lab = self.scenes[si], self.labels[si]
                for _ in range(10):  # retry until a non-empty block
                    center = pts[rng.integers(0, len(pts)), :2]
                    half = self.block_size / 2.0
                    sel = np.nonzero(
                        (np.abs(pts[:, 0] - center[0]) <= half)
                        & (np.abs(pts[:, 1] - center[1]) <= half)
                    )[0]
                    if len(sel) >= 32:
                        break
                p, m, idx = pad_points(pts[sel], n_points, rng)
                if train_augment:
                    p = augment.rotate_z(p, rng)
                    p = augment.jitter(p, rng, sigma=0.005, clip=0.02)
                pts_b.append(_normalize_np(p))
                lab_b.append(lab[sel][idx])
                mask_b.append(m)
            yield {
                "points": np.stack(pts_b),
                "mask": np.stack(mask_b),
                "labels": np.stack(lab_b).astype(np.int32),
            }


def load_scannet(root: str, split: str = "train") -> SceneSegSource:
    path = os.path.join(root, f"scannet_{split}.npz")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"ScanNet not found at {path} — expected scannet_{{split}}.npz "
            "with object arrays 'scenes' and 'labels' (convert the reference "
            "pickles with tools/convert_scannet.py). Use --synthetic for "
            "smoke runs without data."
        )
    data = np.load(path, allow_pickle=True)
    scenes = list(data["scenes"])
    labels = list(data["labels"])
    n_classes = int(max(int(l.max()) for l in labels)) + 1
    return SceneSegSource(scenes=scenes, labels=labels, n_classes=n_classes)


def class_weights_from(labels: list, n_classes: int) -> np.ndarray:
    """Inverse-log-frequency class weights (the reference's ScanNet weighting)."""
    counts = np.zeros(n_classes, np.int64)
    for l in labels:
        counts += np.bincount(l, minlength=n_classes)
    freq = counts / max(counts.sum(), 1)
    return (1.0 / np.log(1.2 + freq + 1e-12)).astype(np.float32)
