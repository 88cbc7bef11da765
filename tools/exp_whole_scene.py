"""Whole-scene MCSeg on one chip via the z-order tile backend (run on TPU).

Builds a ScanNet-like 32k surface scene, sizes the tile-pair capacity, and
runs a full MCSeg train step (hierarchy + tile convs + tile pdf + grads) on
the WHOLE scene at once — no sliding blocks, no spatial sharding.

Usage: python tools/exp_whole_scene.py [n_points] [tile_pairs_override]
       [--batch=B] [--breakdown] [--remat]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def surface_scene(rng, n):
    face = rng.integers(0, 5, size=n)
    u, v = rng.uniform(0, 1, (2, n))
    p = np.zeros((n, 3), np.float32)
    for f_, arr in [(0, np.stack([u, v, np.zeros_like(u)], -1)),
                    (1, np.stack([np.zeros_like(u), u, v], -1)),
                    (2, np.stack([np.ones_like(u), u, v], -1)),
                    (3, np.stack([u, np.zeros_like(u), v], -1)),
                    (4, np.stack([u, np.ones_like(u), v], -1))]:
        p[face == f_] = arr[face == f_]
    p += rng.normal(0, 0.01, size=p.shape)
    return np.clip(p, 0.0, 0.999).astype(np.float32)


def main():
    from mccnn_tpu.models import MCSeg
    from mccnn_tpu.ops.pallas import count_tile_pairs
    from mccnn_tpu.train import make_optimizer, init_state, make_train_step
    from mccnn_tpu.train.losses import segmentation_loss, masked_accuracy

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    N = int(pos[0]) if pos else 32768
    B, grow = 1, 16
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            B = int(a.split("=")[1])
        if a.startswith("--grow="):
            grow = int(a.split("=")[1])
    rng = np.random.default_rng(0)
    pts = jnp.asarray(np.stack([surface_scene(rng, N) for _ in range(B)]))
    mask = jnp.ones((B, N), bool)
    labels = jnp.asarray(rng.integers(0, 8, size=(B, N)), jnp.int32)

    # size the pair capacity on the level-0 conv radius (the tightest tiling);
    # count at the DEFAULT tile — the layer stack's kernels use it
    r0 = 0.05 * 2.0  # radii[0] * conv_radius_scale
    S = int(count_tile_pairs(pts, mask, pts, mask, r0).max())
    if len(pos) > 1:
        S = int(pos[1])
    print(f"N={N} B={B} tile_pairs={S}", flush=True)

    model = MCSeg(n_classes=8, grow=grow, radii=(0.05, 0.15, 0.4), tile_pairs=S)
    if "--site-steps" in sys.argv:
        from mccnn_tpu.tasks.common import auto_tile_steps

        budgets = auto_tile_steps(model, pts, mask)
        print(f"site step budgets: {budgets}", flush=True)
        model = model.clone(tile_steps=budgets)

    def loss_fn(logits, batch):
        return (
            segmentation_loss(logits, batch["labels"], batch["mask"]),
            {"acc": masked_accuracy(logits, batch["labels"], batch["mask"])},
        )

    batch = {"points": pts, "mask": mask, "labels": labels}
    tx = make_optimizer(lr=1e-3)
    t0 = time.perf_counter()
    if "--mem-only" in sys.argv:
        # abstract init: memory_analysis only needs shapes — skips the
        # (minutes-long) real init compile through the remote helper
        state = jax.eval_shape(
            lambda b: init_state(model, tx, jax.random.PRNGKey(0), b), batch
        )
    else:
        state = init_state(model, tx, jax.random.PRNGKey(0), batch)
    print(f"init: {time.perf_counter()-t0:.1f}s", flush=True)
    step = jax.jit(
        make_train_step(model, tx, loss_fn, remat="--remat" in sys.argv),
        donate_argnums=0,
    )

    try:
        # XLA's compiled memory analysis — the remat story's peak-HBM
        # evidence (device memory_stats() is None under the axon relay).
        ma = step.lower(state, batch).compile().memory_analysis()
        print(
            f"XLA memory: temp {ma.temp_size_in_bytes / 2**30:.2f} GiB, "
            f"args {ma.argument_size_in_bytes / 2**30:.2f} GiB, "
            f"output {ma.output_size_in_bytes / 2**30:.2f} GiB",
            flush=True,
        )
    except Exception as e:
        print(f"memory_analysis unavailable: {e!r}", flush=True)
    if "--mem-only" in sys.argv:
        return

    t0 = time.perf_counter()
    state, m = step(state, batch)
    jax.block_until_ready(m["loss"])
    print(f"step compile+run: {time.perf_counter()-t0:.1f}s "
          f"loss={float(m['loss']):.4f}", flush=True)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        state, m = step(state, batch)
        jax.block_until_ready(m["loss"])
        best = min(best, time.perf_counter() - t0)
    print(f"whole-scene train step: {best*1e3:.1f} ms raw "
          f"(~{(best-0.030)*1e3:.1f} ms net) loss={float(m['loss']):.4f}",
          flush=True)
    try:  # peak HBM: the --remat memory story (VERDICT r3 #4)
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            print(f"peak HBM: {peak / 2**30:.2f} GiB "
                  f"(now {stats.get('bytes_in_use', 0) / 2**30:.2f} GiB, "
                  f"limit {stats.get('bytes_limit', 0) / 2**30:.2f} GiB)",
                  flush=True)
    except Exception as e:
        print(f"memory_stats unavailable: {e!r}", flush=True)

    if "--breakdown" in sys.argv:
        # hierarchy-only cost (chain-difference: the step is O(100 ms) so a
        # short chain suffices; perturbing the points keeps a true data dep)
        from mccnn_tpu.api.hierarchy import build_hierarchy
        import functools

        @functools.partial(jax.jit, static_argnums=1)
        def hier_chain(p, n):
            def body(c, _):
                h = build_hierarchy(
                    c, mask, (0.05, 0.15, 0.4), neighbor_k=16,
                    global_level=False, tile_pairs=S,
                )
                bump = sum(jnp.sum(l.points) for l in h.levels[1:])
                return c + 1e-12 * bump, 0
            out, _ = jax.lax.scan(body, p, None, length=n)
            return out.sum()

        def best_of(n, reps=3):
            float(hier_chain(pts, n))
            b = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                float(hier_chain(pts, n))
                b = min(b, time.perf_counter() - t0)
            return b

        per = (best_of(9) - best_of(3)) / 6.0
        print(f"hierarchy build alone: {per*1e3:.1f} ms "
              f"({per / max(best - 0.030, 1e-9) * 100:.0f}% of the net step)",
              flush=True)


if __name__ == "__main__":
    main()
