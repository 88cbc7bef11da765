"""Run the five BASELINE parity harnesses end-to-end and archive the
verdicts (VERDICT r4 #5: the harnesses had only ever run as CPU CI proxies;
this executes the full train->eval loops ON THE REAL CHIP and commits the
evidence under docs/parity_runs/<tag>/).

Each run is a bounded synthetic-proxy config (no real datasets exist in this
environment — BASELINE gate stays UNPROVEN), sized so the model must actually
clear its learnability floor: a TPU-only numeric issue anywhere in the
train/eval/voting/protocol stack shows up as pass=false.

Usage:
  python tools/run_parity_pack.py [--tag r5] [--only modelnet ...]
"""
import argparse
import datetime
import json
import pathlib
import sys
import time

sys.path.insert(0, ".")

# (name, parity-CLI argv) — moderate configs: enough steps to clear the
# synthetic floors (CI uses 2-step smoke configs; these train for real).
RUNS = [
    (
        "modelnet",
        [
            "--synthetic", "--epochs", "8", "--batch", "16", "--points",
            "256", "--grow", "16", "--steps-per-epoch", "16", "--votes", "4",
            "--eval-every", "2", "--bn-decay-steps", "400",
            "--lr-decay-steps", "400",
        ],
    ),
    (
        "modelnet_protocols",
        [
            "--synthetic", "--model", "MCClassH", "--sweep-protocols",
            "--epochs", "40", "--batch", "16", "--points", "256", "--grow",
            "16", "--steps-per-epoch", "16", "--votes", "8", "--eval-every",
            "8", "--bn-decay-steps", "2000", "--lr-decay-steps", "2000",
            "--max-degradation", "0.15",
            # occlusion removes geometry; proxy calibration (r5, with
            # ptDropOut): residual delta 0.31 (CPU) / 0.375 (TPU) is domain
            # shift plus ~2-model noise on the 32-model proxy test set, not
            # a pipeline bug — the train-on-occlusion TPU probe hit 1.0 and
            # the renorm A/B was negative (docs/ROUND5.md). The gate is a
            # REGRESSION catch (pre-dropout measured 0.63).
            "--max-degradation-occlusion", "0.45",
        ],
    ),
    (
        "shapenet",
        [
            "--task", "shapenet", "--synthetic", "--epochs", "20", "--batch",
            "8", "--points", "256", "--grow", "16", "--steps-per-epoch",
            "16", "--eval-every", "2", "--bn-decay-steps", "800",
            "--lr-decay-steps", "800",
        ],
    ),
    (
        "scannet",
        [
            "--task", "scannet", "--synthetic", "--epochs", "20", "--batch",
            "8", "--points", "256", "--grow", "16", "--steps-per-epoch",
            "16", "--eval-every", "2", "--bn-decay-steps", "500",
            "--lr-decay-steps", "500",
        ],
    ),
    (
        "normals",
        [
            "--task", "normals", "--synthetic", "--epochs", "6", "--batch",
            "8", "--points", "256", "--grow", "16", "--steps-per-epoch",
            "16", "--eval-every", "2", "--bn-decay-steps", "300",
            "--lr-decay-steps", "300",
        ],
    ),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r5")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (calibration runs while the TPU is down)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mccnn_tpu.tasks import parity

    backend = jax.default_backend()
    out_dir = pathlib.Path(args.out or f"docs/parity_runs/{args.tag}")
    out_dir.mkdir(parents=True, exist_ok=True)

    results = {}
    for name, argv in RUNS:
        if args.only and name not in args.only:
            continue
        scratch = out_dir / f"_{name}_scratch"
        argv = argv + [
            "--ckpt-dir", str(scratch / "ck"), "--log-dir", str(scratch / "lg"),
        ]
        print(f"=== {name} (backend={backend}) ===", flush=True)
        t0 = time.time()
        verdict = parity.main(list(argv))
        record = {
            "run": name,
            "date": datetime.date.today().isoformat(),
            "backend": backend,
            "device": str(jax.devices()[0]),
            "wall_s": round(time.time() - t0, 1),
            "argv": argv[:-4],  # drop scratch paths
            "verdict": verdict,
        }
        (out_dir / f"{name}.json").write_text(json.dumps(record, indent=2))
        results[name] = verdict
        print(f"--- {name}: pass={verdict['pass']} "
              f"({record['wall_s']}s)", flush=True)

    print(json.dumps({k: v.get("pass") for k, v in results.items()}))


if __name__ == "__main__":
    main()
