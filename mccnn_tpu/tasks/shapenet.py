"""ShapeNet part segmentation — train / eval CLI.

Reference parity (viscom-ulm/MCCNN): ``ShapeNet/ShapeNet.py`` +
``ShapeNetEval.py`` (SURVEY §2.2): MCSeg encoder-decoder with the category
one-hot appended to input features, per-category IoU bookkeeping, Adam +
exponential decay, checkpoints.

Usage:
  python -m mccnn_tpu.tasks.shapenet --synthetic --epochs 2   # smoke
  python -m mccnn_tpu.tasks.shapenet --data /data/shapenetcore_partanno_...
"""

from __future__ import annotations

import numpy as np

from ..data import datasets, synthetic
from ..models import MCSeg
from ..train import masked_accuracy, segmentation_loss
from .common import Runner, base_parser


class SyntheticSegSource:
    def __init__(self, n_models: int, n_parts: int, n_categories: int, seed: int):
        rng = np.random.default_rng(seed)
        pts, labels = synthetic.segmentation_batch(rng, n_models, 4096, n_parts)
        self._src = datasets.PartSegSource(
            clouds=[p for p in pts],
            point_labels=[l for l in labels],
            categories=rng.integers(0, n_categories, n_models).astype(np.int32),
            n_categories=n_categories,
            n_parts=n_parts,
        )
        self.n_categories = n_categories
        self.n_parts = n_parts
        self.categories = self._src.categories

    def batches(self, *a, **kw):
        return self._src.batches(*a, **kw)


def evaluate(runner: Runner, source, args, rng) -> dict:
    """Per-category mean IoU, the ShapeNet metric (SURVEY §2.2)."""
    n_parts = source.n_parts
    inter = np.zeros(n_parts, np.int64)
    union = np.zeros(n_parts, np.int64)
    correct = total = 0
    per_shape_ious = []
    for batch in source.batches(
        args.batch, args.points, rng, shuffle=False, drop_remainder=False
    ):
        logits = np.asarray(runner.eval_logits(batch))
        pred = logits.argmax(-1)
        lab = batch["labels"]
        mask = batch["mask"]
        correct += int(((pred == lab) & mask).sum())
        total += int(mask.sum())
        for b in range(len(pred)):
            ious = []
            for c in np.unique(lab[b][mask[b]]):
                p = (pred[b] == c) & mask[b]
                t = (lab[b] == c) & mask[b]
                i, u = (p & t).sum(), (p | t).sum()
                inter[c] += i
                union[c] += u
                ious.append(i / max(u, 1))
            if ious:
                per_shape_ious.append(float(np.mean(ious)))
    seen = union > 0
    return {
        "point_accuracy": correct / max(total, 1),
        "mIoU_class": float((inter[seen] / np.maximum(union[seen], 1)).mean()),
        "mIoU_instance": float(np.mean(per_shape_ious)) if per_shape_ious else 0.0,
    }


def main(argv=None):
    p = base_parser("ShapeNet part segmentation (MCSeg)")
    p.add_argument("--n-parts", type=int, default=None)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    if args.synthetic:
        # size the procedural set so --steps-per-epoch is actually reachable
        n_train = max(args.batch * 4, args.batch * (args.steps_per_epoch or 0), 64)
        train_src = SyntheticSegSource(n_train, args.n_parts or 4, 16, args.seed)
        test_src = SyntheticSegSource(max(args.batch * 2, 32), args.n_parts or 4, 16, args.seed + 1)
    else:
        train_src = datasets.load_shapenet_part(args.data, "train")
        test_src = datasets.load_shapenet_part(args.data, "test")

    kw = {"n_classes": train_src.n_parts}
    if args.grow:
        kw["grow"] = args.grow
    if args.bn_decay_steps:
        kw["bn_schedule_steps"] = args.bn_decay_steps
    model = MCSeg(**kw)

    def loss_fn(logits, batch):
        return (
            segmentation_loss(logits, batch["labels"], batch["mask"]),
            {"acc": masked_accuracy(logits, batch["labels"], batch["mask"])},
        )

    example = next(
        train_src.batches(args.batch, args.points, np.random.default_rng(0))
    )

    runner = Runner(args, model, loss_fn, example, "shapenet_mcseg")

    if args.eval_only:
        res = evaluate(runner, test_src, args, rng)
        runner.metrics.log(int(runner.state.step), tag="eval", **res)
        runner.close()
        return res

    best = 0.0
    for epoch in range(runner.start_epoch, args.epochs):
        batches = train_src.batches(
            args.batch, args.points, rng, train_augment=True, protocol=args.protocol
        )
        runner.train_epoch(batches, epoch)
        if (epoch + 1) % args.eval_every == 0:
            res = evaluate(runner, test_src, args, rng)
            runner.metrics.log(int(runner.state.step), tag="eval", epoch=epoch, **res)
            if res["mIoU_instance"] >= best:
                best = res["mIoU_instance"]
                runner.save(epoch + 1)
    runner.metrics.log(int(runner.state.step), tag="final", best_mIoU=best)
    runner.close()
    return {"best_mIoU": best}


if __name__ == "__main__":
    main()
