"""ScanNet-scale data-pipeline soak (VERDICT r3 #7): ~1.2k scenes through the
full native-hostpipe block pipeline feeding real train steps, measuring
steps/s and the input-stall fraction (host time the device spends waiting for
the next batch).

The round-3 data-path evidence was 6-8 synthetic scenes; real ScanNet v1 has
~1.2k train scenes, so this proves the C++ host pipeline at production scene
count and memory footprint, not toy counts.

Usage: python tools/exp_data_soak.py [--scenes 1200] [--steps 60]
       [--batch 8] [--points 8192] [--pipe native|numpy]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=1200)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--points", type=int, default=8192)
    ap.add_argument("--pipe", default="native", choices=("native", "numpy"))
    ap.add_argument("--grow", type=int, default=16)
    args = ap.parse_args()

    import os

    os.environ["MCCNN_HOST_PIPE"] = args.pipe

    import jax
    import jax.numpy as jnp

    from mccnn_tpu.data import datasets
    from mccnn_tpu.models import MCSeg
    from mccnn_tpu.train import (
        init_state,
        make_optimizer,
        make_train_step,
        masked_accuracy,
        segmentation_loss,
    )

    n_classes = 8
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    scenes, labels = [], []
    for _ in range(args.scenes):
        n = int(rng.integers(20000, 40000))
        pts = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        pts[:, :2] *= 6.0
        lab = np.digitize(
            pts[:, 2], np.linspace(0, 1, n_classes + 1)[1:-1]
        ).astype(np.int32)
        scenes.append(pts)
        labels.append(lab)
    src = datasets.SceneSegSource(scenes, labels, n_classes)
    gb = sum(s.nbytes for s in scenes) / 2**30
    print(
        f"built {args.scenes} scenes ({gb:.2f} GiB host) in "
        f"{time.perf_counter() - t0:.1f}s",
        flush=True,
    )

    model = MCSeg(n_classes=n_classes, grow=args.grow, radii=(0.05, 0.15, 0.4))

    def loss_fn(logits, batch):
        return (
            segmentation_loss(logits, batch["labels"], batch["mask"]),
            {"acc": masked_accuracy(logits, batch["labels"], batch["mask"])},
        )

    tx = make_optimizer(lr=1e-3)
    it = src.batches(
        args.batch, args.points, rng, train_augment=True,
        blocks_per_epoch=args.batch * (args.steps + 4),
    )
    first = next(it)
    # mirror the task boundary: size the tile capacity from the first batch
    # (big-N sites then route tile instead of bucket/dense)
    from mccnn_tpu.tasks.common import maybe_auto_tile_pairs

    model = maybe_auto_tile_pairs(model, first)
    state = init_state(model, tx, jax.random.PRNGKey(0), first)
    step = jax.jit(make_train_step(model, tx, loss_fn), donate_argnums=0)
    state, m = step(state, first)  # compile
    jax.block_until_ready(m["loss"])
    print(f"compiled; first loss {float(m['loss']):.4f}", flush=True)

    host_t = 0.0
    total0 = time.perf_counter()
    n_steps = 0
    # Serialized accounting: time next(it) (host assembly) separately from
    # the dispatched step. The harness's ~30 ms relay rides the step term;
    # the input-stall fraction is host_t / total, an upper bound on what an
    # overlapped (prefetching) loop would stall.
    for _ in range(args.steps):
        t0 = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            break
        host_t += time.perf_counter() - t0
        state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        n_steps += 1
    total = time.perf_counter() - total0
    print(
        f"pipe={args.pipe}: {n_steps} steps in {total:.2f}s = "
        f"{n_steps / total:.2f} steps/s "
        f"({n_steps * args.batch * args.points / total / 1e6:.2f} Mpts/s); "
        f"host batch assembly {host_t:.2f}s = "
        f"{100 * host_t / total:.1f}% input-stall fraction; "
        f"final loss {float(m['loss']):.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
