"""One-command accuracy-parity harnesses for ALL BASELINE configs.

BASELINE.md configs 1-5 map to ``--task``:

  modelnet  — MCClass(S/H) overall accuracy vs the paper's ~90.9 % (gate
              ±0.3 %, the BASELINE quality gate). Non-uniform robustness
              (config 2) is the same harness with ``--protocol`` + MCClassH.
  shapenet  — MCSeg instance-average part mIoU vs the paper's ~85.9 [M].
  scannet   — MCSeg scene mIoU (paper value not recalled — pass ``--target``
              when re-derived; until then the verdict carries pass=null).
  normals   — MCNorm angular error in degrees (lower is better; paper value
              not recalled — same treatment).

Each run is deterministic (fixed seeds, fixed eval protocol) and prints ONE
JSON verdict line, so the moment real data is available each gate is a single
command, e.g.:

  python -m mccnn_tpu.tasks.parity --data /data/modelnet40_normal_resampled
  python -m mccnn_tpu.tasks.parity --task shapenet --data /data/shapenet_seg

Without data (--synthetic) each harness validates its machinery end-to-end on
procedural clouds (verdict marked ``proxy: true``, compared against a
synthetic-learnability floor instead of the paper number).

Reference hyperparameters below are [M]-tagged guesses (SURVEY §2.2 — mount
empty all rounds); each is a CLI flag so re-deriving them when the mount
appears is config-only.
"""

from __future__ import annotations

import json
import sys

import numpy as np

from . import modelnet
from .common import base_parser

PAPER_ACCURACY = 0.909  # [M] SURVEY §6 — re-verify against the paper/reference
PAPER_SHAPENET_MIOU = 0.859  # [M] low confidence (BASELINE.md)
GATE = 0.003


def _task_main(args, extra):
    """Run a task module's main() with the parity protocol fixed, return its
    best-metric dict."""
    argv = []
    if args.synthetic or not args.data:
        argv.append("--synthetic")
    else:
        argv += ["--data", args.data]
    argv += [
        "--batch", str(args.batch), "--points", str(args.points),
        "--epochs", str(args.epochs), "--lr", str(args.lr),
        "--lr-decay-steps", str(args.lr_decay_steps),
        "--lr-decay-rate", str(args.lr_decay_rate),
        "--seed", str(args.seed), "--eval-every", str(args.eval_every),
        "--protocol", args.protocol,
        "--log-dir", args.log_dir,
    ]
    if args.bn_decay_steps:
        argv += ["--bn-decay-steps", str(args.bn_decay_steps)]
    if args.grow:
        argv += ["--grow", str(args.grow)]
    if args.steps_per_epoch:
        argv += ["--steps-per-epoch", str(args.steps_per_epoch)]
    if args.ckpt_dir:
        argv += ["--ckpt-dir", args.ckpt_dir]
    argv += extra
    if args.task == "shapenet":
        from . import shapenet

        return shapenet.main(argv)
    if args.task == "scannet":
        from . import scannet

        return scannet.main(argv)
    from . import normals

    return normals.main(argv)


def _other_task(args, proxy):
    """shapenet / scannet / normals parity verdicts via the task CLIs."""
    spec = {
        # metric key in the task's return dict, paper target (None = not
        # recalled), gate, higher-is-better, synthetic-proxy floor
        "shapenet": ("best_mIoU", PAPER_SHAPENET_MIOU, 0.005, True, 0.25),
        "scannet": ("best_mIoU", None, 0.005, True, 0.25),
        "normals": ("best_angular_error", None, 0.5, False, 45.0),
    }[args.task]
    key, paper, gate, higher, floor = spec
    target = args.target if args.target is not None else paper
    if proxy:
        target = floor
    res = _task_main(args, [])
    value = float(res[key])
    ok = None
    if target is not None:
        g = args.gate if args.gate is not None else gate
        ok = bool(value >= target - g) if higher else bool(value <= target + g)
    verdict = {
        "metric": f"{args.task}_parity",
        key: round(value, 4),
        "target": target,
        "gate": args.gate if args.gate is not None else gate,
        "pass": ok,
        "proxy": proxy,
        "protocol": args.protocol,
        "seed": args.seed,
    }
    if proxy:
        verdict["note"] = (
            "synthetic proxy run (no real dataset in this environment); "
            "target is a learnability floor, not the paper number"
        )
    elif target is None:
        verdict["note"] = (
            "paper value not recalled (BASELINE.md) — pass --target once "
            "re-derived from the reference"
        )
    print(json.dumps(verdict))
    return verdict


def main(argv=None):
    p = base_parser("Accuracy-parity harnesses for the BASELINE configs")
    p.add_argument(
        "--task",
        default="modelnet",
        choices=("modelnet", "shapenet", "scannet", "normals"),
    )
    p.add_argument("--model", default="MCClassS", choices=sorted(modelnet.MODELS))
    p.add_argument("--votes", type=int, default=8)
    p.add_argument("--target", type=float, default=None)
    p.add_argument("--gate", type=float, default=None)
    p.add_argument(
        "--sweep-protocols",
        action="store_true",
        help="BASELINE config 2 as ONE verdict (VERDICT r3 #6): train once, "
        "then evaluate under uniform + all four non-uniform sampling "
        "protocols; emits the uniform accuracy, the four deltas (the paper's "
        "robustness table shape), and pass/fail against --max-degradation",
    )
    p.add_argument(
        "--max-degradation",
        type=float,
        default=0.03,
        help="with --sweep-protocols: max allowed accuracy drop under any "
        "non-uniform DENSITY protocol (gradient/split/lambert; paper: "
        "MCClassH degrades only ~1-2 pts)",
    )
    p.add_argument(
        "--max-degradation-occlusion",
        type=float,
        default=None,
        help="separate gate for the occlusion protocol (it removes geometry "
        "rather than reweighting density; defaults to --max-degradation). "
        "Synthetic-proxy calibration r5: trained-on-full-shapes MCClassH "
        "holds ~0.31 delta with ptDropOut (was 0.63 without)",
    )
    # reference-protocol defaults ([M]): 1024 pts, batch 32, Adam 1e-3 with
    # exponential decay, BN decay schedule on, dropout in the model defaults
    p.set_defaults(
        points=1024,
        batch=32,
        epochs=250,
        lr=1e-3,
        lr_decay_steps=20000,
        lr_decay_rate=0.7,
        bn_decay_steps=20000,
        eval_every=5,
        pt_drop_max=0.3,  # reference ptDropOut on for classification
    )
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    proxy = args.synthetic or not args.data
    if args.task != "modelnet":
        return _other_task(args, proxy)
    if args.gate is None:
        args.gate = GATE
    if proxy:
        n_classes = args.n_classes if getattr(args, "n_classes", None) else 6
        # size the procedural set so --steps-per-epoch is actually reachable
        # (r5 calibration: 64 models at batch 16 capped epochs at 4 steps)
        n_train = max(
            args.batch * 4, args.batch * (args.steps_per_epoch or 0), 64
        )
        train_src = modelnet.SyntheticSource(n_train, n_classes, args.seed)
        test_src = modelnet.SyntheticSource(
            max(args.batch * 2, 32), n_classes, args.seed + 1
        )
        target = 0.5  # synthetic 6-class learnability floor (round 1: 0.80)
    else:
        from ..data import datasets

        train_src = datasets.load_modelnet40(args.data, "train")
        test_src = datasets.load_modelnet40(args.data, "test")
        n_classes = len(train_src.class_names)
        target = args.target if args.target is not None else PAPER_ACCURACY

    model = modelnet.build_model(
        args.model, n_classes, args.grow, args.bn_decay_steps
    )
    example = next(
        train_src.batches(args.batch, args.points, np.random.default_rng(0))
    )
    runner = modelnet.Runner(
        args, model, modelnet.make_loss(args.model), example,
        f"parity_{args.model}",
    )

    best = 0.0
    for epoch in range(runner.start_epoch, args.epochs):
        batches = train_src.batches(
            args.batch, args.points, rng, train_augment=True,
            protocol=args.protocol, pt_drop_max=args.pt_drop_max,
        )
        runner.train_epoch(batches, epoch)
        if (epoch + 1) % args.eval_every == 0:
            res = modelnet.evaluate(runner, test_src, args, args.votes, rng)
            runner.metrics.log(
                int(runner.state.step), tag="eval", epoch=epoch, **res
            )
            if res["accuracy"] > best:
                best = res["accuracy"]
                runner.save(epoch + 1)

    if args.sweep_protocols:
        # BASELINE config 2 (the paper's robustness table) as one verdict:
        # the SAME trained weights evaluated under every sampling protocol.
        sweep = {}
        train_protocol = args.protocol
        for proto in ("uniform", "gradient", "split", "lambert", "occlusion"):
            args.protocol = proto
            sweep[proto] = modelnet.evaluate(
                runner, test_src, args, args.votes,
                np.random.default_rng(args.seed + 100),
            )["accuracy"]
        args.protocol = train_protocol
        runner.close()
        uni = sweep["uniform"]
        deltas = {
            k: round(uni - v, 4) for k, v in sweep.items() if k != "uniform"
        }
        # Occlusion gets its own gate: unlike the density protocols (which
        # the PDF compensation must absorb — the paper's core claim), it
        # REMOVES geometry, and on the 6-class synthetic proxy a trained-on-
        # full-shapes model genuinely can't see the hidden half. The r5
        # soundness probe (train occlusion -> eval occlusion = 1.0 on TPU)
        # and the renorm A/B (docs/ROUND5.md) pin the residual delta as
        # domain shift, not a pipeline bug.
        occl_gate = (
            args.max_degradation_occlusion
            if args.max_degradation_occlusion is not None
            else args.max_degradation
        )
        worst = max(v for k, v in deltas.items() if k != "occlusion")
        uni_target = target
        uni_ok = bool(uni >= uni_target - args.gate)
        verdict = {
            "metric": "modelnet40_protocol_robustness",
            "model": args.model,
            "uniform_accuracy": round(uni, 4),
            "uniform_target": uni_target,
            "deltas": deltas,
            "worst_degradation": round(max(deltas.values()), 4),
            "worst_density_degradation": round(worst, 4),
            "max_degradation": args.max_degradation,
            "max_degradation_occlusion": occl_gate,
            "pass": bool(
                uni_ok
                and worst <= args.max_degradation
                and deltas["occlusion"] <= occl_gate
            ),
            "proxy": proxy,
            "votes": args.votes,
            "train_protocol": train_protocol,
            "seed": args.seed,
        }
        if proxy:
            verdict["note"] = (
                "synthetic proxy run; uniform target is a learnability "
                "floor, not the paper number"
            )
        print(json.dumps(verdict))
        return verdict

    runner.close()

    verdict = {
        "metric": "modelnet40_accuracy_parity",
        "accuracy": round(best, 4),
        "target": target,
        "gate": args.gate,
        "pass": bool(best >= target - args.gate),
        "proxy": proxy,
        "votes": args.votes,
        "protocol": args.protocol,
        "seed": args.seed,
    }
    if proxy:
        verdict["note"] = (
            "synthetic proxy run (no ModelNet40 data in this environment); "
            "target is a learnability floor, not the paper number"
        )
    print(json.dumps(verdict))
    return verdict


if __name__ == "__main__":
    sys.exit(0 if main()["pass"] else 1)
