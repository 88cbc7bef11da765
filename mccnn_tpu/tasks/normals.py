"""Per-point normal estimation — train / eval CLI.

Reference parity (viscom-ulm/MCCNN): the MCNorm workload (SURVEY §2.2, §0
workload 3): encoder-decoder over the hierarchy, per-point 3-vector output,
angular (cosine) loss against ground-truth normals; evaluated as mean angular
error in degrees (sign-invariant).

Usage:
  python -m mccnn_tpu.tasks.normals --synthetic --epochs 2   # smoke
  python -m mccnn_tpu.tasks.normals --data /data/modelnet40_normal_resampled
"""

from __future__ import annotations

import numpy as np

from ..data import datasets, synthetic
from ..models import MCNorm, MCNormS
from ..train import normal_loss
from .common import Runner, base_parser

MODELS = {"MCNorm": MCNorm, "MCNormS": MCNormS}


class NormalsSource:
    """Wraps a ClassificationSource, emitting ground-truth normals as labels."""

    def __init__(self, clouds, normals):
        self.clouds = clouds
        self.normals = normals

    @classmethod
    def synthetic(cls, n_models: int, seed: int):
        rng = np.random.default_rng(seed)
        pts, nrm = synthetic.normals_batch(rng, n_models, 4096)
        return cls([p for p in pts], [n for n in nrm])

    @classmethod
    def from_modelnet(cls, root: str, split: str):
        src = datasets.load_modelnet40(root, split)
        keep = [i for i, n in enumerate(src.normals) if n is not None]
        return cls([src.clouds[i] for i in keep], [src.normals[i] for i in keep])

    def batches(self, batch_size, n_points, rng, *, shuffle=True,
                train_augment=False, protocol="uniform", drop_remainder=True):
        order = np.arange(len(self.clouds))
        if shuffle:
            rng.shuffle(order)
        from ..data.datasets import _normalize_np
        from ..data.sampling_protocols import draw

        import os as _os

        use_native = protocol == "uniform" and _os.environ.get(
            "MCCNN_HOST_PIPE", "native"
        ) != "numpy"
        for start in range(0, len(order), batch_size):
            chunk = order[start : start + batch_size]
            if len(chunk) < batch_size and drop_remainder:
                return
            if use_native:
                # C++ sample+normalize (no augmentation on this task);
                # ground-truth normals gathered with the returned rows.
                from .. import native

                res = native.assemble_batch(
                    [self.clouds[i] for i in chunk],
                    n_points,
                    seed=int(rng.integers(2**63)),
                    augment=False,
                    return_idx=True,
                )
                if res is not None:
                    pts, idx = res
                    yield {
                        "points": pts,
                        "mask": np.ones((len(chunk), n_points), bool),
                        "normals": np.stack(
                            [
                                self.normals[i][idx[k]]
                                for k, i in enumerate(chunk)
                            ]
                        ).astype(np.float32),
                    }
                    continue
                use_native = False
            pts_b, nrm_b = [], []
            for i in chunk:
                idx = draw(protocol, self.clouds[i], n_points, rng,
                           normals=self.normals[i])
                pts_b.append(_normalize_np(self.clouds[i][idx]))
                nrm_b.append(self.normals[i][idx])
            yield {
                "points": np.stack(pts_b),
                "mask": np.ones((len(chunk), n_points), bool),
                "normals": np.stack(nrm_b).astype(np.float32),
            }


def angular_error_deg(pred: np.ndarray, target: np.ndarray, mask: np.ndarray):
    p = pred / np.maximum(np.linalg.norm(pred, axis=-1, keepdims=True), 1e-8)
    t = target / np.maximum(np.linalg.norm(target, axis=-1, keepdims=True), 1e-8)
    cos = np.abs((p * t).sum(-1)).clip(0, 1)
    deg = np.degrees(np.arccos(cos))
    return float(deg[mask].mean())


def evaluate(runner: Runner, source, args, rng) -> dict:
    errs = []
    for batch in source.batches(
        args.batch, args.points, rng, shuffle=False, drop_remainder=False
    ):
        pred = np.asarray(runner.eval_logits(batch))
        errs.append(angular_error_deg(pred, batch["normals"], batch["mask"]))
    return {"angular_error_deg": float(np.mean(errs))}


def main(argv=None):
    p = base_parser("Per-point normal estimation (MCNorm/MCNormS)")
    p.add_argument("--model", default="MCNorm", choices=sorted(MODELS))
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    if args.synthetic:
        # size the procedural set so --steps-per-epoch is actually reachable
        n_train = max(args.batch * 4, args.batch * (args.steps_per_epoch or 0), 64)
        train_src = NormalsSource.synthetic(n_train, args.seed)
        test_src = NormalsSource.synthetic(max(args.batch * 2, 32), args.seed + 1)
    else:
        train_src = NormalsSource.from_modelnet(args.data, "train")
        test_src = NormalsSource.from_modelnet(args.data, "test")

    kw = {}
    if args.grow:
        kw["grow"] = args.grow
    if args.bn_decay_steps:
        kw["bn_schedule_steps"] = args.bn_decay_steps
    model = MODELS[args.model](**kw)

    def loss_fn(pred, batch):
        return normal_loss(pred, batch["normals"], batch["mask"]), {}

    example = next(
        train_src.batches(args.batch, args.points, np.random.default_rng(0))
    )
    runner = Runner(args, model, loss_fn, example, f"normals_{args.model}")

    if args.eval_only:
        res = evaluate(runner, test_src, args, rng)
        runner.metrics.log(int(runner.state.step), tag="eval", **res)
        runner.close()
        return res

    best = float("inf")
    for epoch in range(runner.start_epoch, args.epochs):
        batches = train_src.batches(
            args.batch, args.points, rng, train_augment=False, protocol=args.protocol
        )
        runner.train_epoch(batches, epoch)
        if (epoch + 1) % args.eval_every == 0:
            res = evaluate(runner, test_src, args, rng)
            runner.metrics.log(int(runner.state.step), tag="eval", epoch=epoch, **res)
            if res["angular_error_deg"] <= best:
                best = res["angular_error_deg"]
                runner.save(epoch + 1)
    runner.metrics.log(int(runner.state.step), tag="final", best_angular_error=best)
    runner.close()
    return {"best_angular_error": best}


if __name__ == "__main__":
    main()
