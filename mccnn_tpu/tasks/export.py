"""Export a trained model to a self-contained serving bundle (``.mcb``).

Beyond-reference capability (the reference redeploys by re-running its TF1
graph from the repo checkout — SURVEY §3.1); see ``mccnn_tpu/serve.py`` for
the artifact design. Usage::

    python -m mccnn_tpu.tasks.export --model MCClassS --n-classes 40 \
        --ckpt ckpts/modelnet_MCClassS --batch 8 --points 1024 \
        --out modelnet.mcb --check

Without ``--ckpt`` the bundle carries freshly-initialized parameters (shape/
pipeline validation only — it will say so in the manifest).
"""

from __future__ import annotations

import argparse

import jax
import numpy as np

from .. import serve
from ..models import MCClass, MCClassH, MCClassS, MCNorm, MCNormS, MCSeg
from ..train import init_state, make_optimizer
from ..train.checkpoint import Checkpointer

ZOO = {
    "MCClassS": MCClassS,
    "MCClass": MCClass,
    "MCClassH": MCClassH,
    "MCNorm": MCNorm,
    "MCNormS": MCNormS,
    "MCSeg": MCSeg,
}


def build_model(args):
    cls = ZOO[args.model]
    kw = {}
    if args.model.startswith("MCClass") or args.model == "MCSeg":
        kw["n_classes"] = args.n_classes
    if args.grow:
        kw["grow"] = args.grow
    if args.radii:
        kw["radii"] = tuple(float(r) for r in args.radii.split(","))
    if args.model == "MCSeg" and args.tile_pairs:
        # whole-scene bundle: route big-N conv/pdf through the z-order tile
        # kernels so one exported program serves an entire scene in one pass
        kw["tile_pairs"] = args.tile_pairs
    return cls(**kw)


def example_batch(args) -> dict:
    rng = np.random.default_rng(args.seed)
    batch = {
        "points": rng.uniform(0, 1, (args.batch, args.points, 3)).astype(
            np.float32
        ),
        "mask": np.ones((args.batch, args.points), bool),
    }
    if args.features_dim:
        batch["features"] = np.ones(
            (args.batch, args.points, args.features_dim), np.float32
        )
    if args.n_categories:
        onehot = np.zeros((args.batch, args.n_categories), np.float32)
        onehot[:, 0] = 1.0
        batch["category_onehot"] = onehot
    return batch


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--model", required=True, choices=sorted(ZOO))
    p.add_argument("--n-classes", type=int, default=40)
    p.add_argument("--n-categories", type=int, default=0, help="MCSeg one-hot")
    p.add_argument("--features-dim", type=int, default=0, help="0 = ones")
    p.add_argument("--grow", type=int, default=None)
    p.add_argument(
        "--batch",
        type=str,
        default="8",
        help="batch size, or a comma list (e.g. '1,4,8') for a "
        "bucketed-batch bundle — requests route to the smallest fitting "
        "program",
    )
    p.add_argument("--points", type=int, default=1024)
    p.add_argument(
        "--radii",
        type=str,
        default=None,
        help="comma list overriding the model's hierarchy radii "
        "(e.g. '0.05,0.15,0.4')",
    )
    p.add_argument(
        "--tile-pairs",
        type=int,
        default=None,
        help="MCSeg only: static z-order tile-pair capacity — export a "
        "whole-scene bundle (one pass per scene, no sliding blocks)",
    )
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--out", type=str, required=True)
    p.add_argument(
        "--platforms",
        type=str,
        default=None,
        help="comma list, e.g. 'cpu,tpu' (portable backend only); "
        "default: the current backend",
    )
    p.add_argument("--check", action="store_true", help="roundtrip-verify")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    batch_sizes = sorted({int(b) for b in args.batch.split(",")})
    model = build_model(args)
    args.batch = batch_sizes[-1]
    batch = example_batch(args)
    from .common import maybe_auto_tile_pairs

    # big-N bundles with no --tile-pairs get the measured-best tile backend
    # auto-sized from the export example batch (VERDICT r3 #3)
    model = maybe_auto_tile_pairs(model, batch)
    state = init_state(
        model, make_optimizer(), jax.random.PRNGKey(args.seed), batch
    )
    trained = False
    if args.ckpt:
        ckpt = Checkpointer(args.ckpt)
        state, extra = ckpt.restore(state)
        ckpt.close()
        trained = True
        print(f"restored checkpoint (epoch {extra.get('epoch', '?')})")

    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    exports = []
    for bs in batch_sizes:
        args.batch = bs
        exports.append(
            serve.export_predict(
                model,
                state.params,
                state.batch_stats,
                example_batch(args),
                platforms=platforms,
            )
        )
    manifest = serve.save_bundle(
        args.out,
        exports if len(exports) > 1 else exports[0],
        manifest={
            "model": args.model,
            "trained": trained,
            "checkpoint": args.ckpt,
            "flags": {
                k: getattr(args, k)
                for k in (
                    "n_classes",
                    "n_categories",
                    "features_dim",
                    "grow",
                    "batch",
                    "points",
                    "radii",
                    "tile_pairs",
                )
            },
        },
    )
    print(f"wrote {args.out} (platforms {manifest['platforms']})")

    if args.check:
        bundle = serve.load_bundle(args.out)
        got = bundle.predict(batch)
        want = serve.make_predict_fn(model, state.params, state.batch_stats)(
            batch
        )
        # The deserialized program recompiles from StableHLO with its own
        # fusion choices — compare at a scale-aware tolerance, not bitwise.
        err = max(
            float(
                np.max(np.abs(np.asarray(g) - np.asarray(w)))
                / max(float(np.max(np.abs(np.asarray(w)))), 1.0)
            )
            for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want))
        )
        print(f"roundtrip max rel Δ = {err:.3g}")
        if err > 1e-4:
            raise SystemExit("roundtrip check FAILED")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
