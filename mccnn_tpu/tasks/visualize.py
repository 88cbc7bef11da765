"""Visualization dumps — colored PLY outputs for qualitative inspection.

Reference parity: the reference's verification story included saving colored
segmentations / normal maps via ``utils/PyUtils`` (SURVEY §4, §5.5). This CLI
renders synthetic or provided clouds through a trained checkpoint and writes
``.ply`` files viewable in MeshLab/CloudCompare.

Usage:
  python -m mccnn_tpu.tasks.visualize --task seg --synthetic --out /tmp/viz
  python -m mccnn_tpu.tasks.visualize --task normals --synthetic --out /tmp/viz
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..utils.io import save_normals_ply, save_segmentation_ply, write_ply


def main(argv=None):
    p = argparse.ArgumentParser(description="Render predictions to PLY")
    p.add_argument("--task", choices=("seg", "normals"), default="seg")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--cloud", type=str, default=None, help="input .txt/.pts")
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--points", type=int, default=1024)
    p.add_argument("--grow", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax

    from ..data import synthetic
    from ..data.datasets import _normalize_np

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)

    if args.cloud:
        from ..utils.io import read_points_txt

        raw = read_points_txt(args.cloud)[:, :3]
        idx = rng.choice(len(raw), args.points, replace=len(raw) < args.points)
        pts = _normalize_np(raw[idx])[None]
    elif args.task == "seg":
        pts, gt = synthetic.segmentation_batch(rng, 1, args.points)
        pts = np.stack([_normalize_np(p) for p in pts])
    else:
        pts, gt = synthetic.normals_batch(rng, 1, args.points)
        pts = np.stack([_normalize_np(p) for p in pts])

    import jax.numpy as jnp

    mask = jnp.ones(pts.shape[:2], bool)
    jpts = jnp.asarray(pts)

    if args.task == "seg":
        from ..models import MCSeg

        model = MCSeg(n_classes=4, grow=args.grow, radii=(0.1, 0.3))
        variables = model.init(jax.random.PRNGKey(0), jpts, mask, train=False)
        out = np.asarray(model.apply(variables, jpts, mask, train=False))
        pred = out.argmax(-1)[0]
        path = os.path.join(args.out, "segmentation.ply")
        save_segmentation_ply(path, pts[0], pred)
        if not args.cloud:
            save_segmentation_ply(
                os.path.join(args.out, "segmentation_gt.ply"), pts[0], gt[0]
            )
    else:
        from ..models import MCNormS

        model = MCNormS(grow=args.grow)
        variables = model.init(jax.random.PRNGKey(0), jpts, mask, train=False)
        out = np.asarray(model.apply(variables, jpts, mask, train=False))
        path = os.path.join(args.out, "normals.ply")
        save_normals_ply(path, pts[0], out[0])
    print(f"wrote {path}")
    return path


if __name__ == "__main__":
    main()
