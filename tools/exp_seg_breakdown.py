"""Whole-scene MCSeg 32k step breakdown (run on real TPU).

Chain-difference times for nested prefixes of the step:
  * build_hierarchy alone
  * + SpatialCache pdf queries (tile KDE per level)
  * full forward (logits)
  * full train step (fwd + bwd + adam)

Usage: python tools/exp_seg_breakdown.py [n_points]
"""
import functools
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


def chain(fn, x, n_short=3, n_long=9, reps=3):
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(c, _):
            return c + 1e-12 * fn(c), 0
        out, _ = jax.lax.scan(body, p, None, length=k)
        return out.sum()

    def best_of(k):
        float(run(x, k))
        b = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best_of(n_long) - best_of(n_short)) / (n_long - n_short)


def main():
    from mccnn_tpu.api.builder import SpatialCache
    from mccnn_tpu.api.hierarchy import build_hierarchy
    from mccnn_tpu.models import MCSeg
    from mccnn_tpu.ops.pallas import count_tile_pairs
    from mccnn_tpu.train import make_optimizer, init_state, make_train_step
    from mccnn_tpu.train.losses import segmentation_loss, masked_accuracy

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    rng = np.random.default_rng(0)
    pts = jnp.asarray(surface_scene(rng, N))[None]
    mask = jnp.ones((1, N), bool)
    labels = jnp.asarray(rng.integers(0, 8, size=(1, N)), jnp.int32)
    radii = (0.05, 0.15, 0.4)
    S = int(count_tile_pairs(pts, mask, pts, mask, 2 * radii[0]).max())
    print(f"N={N} tile_pairs={S}", flush=True)

    def hier(p):
        h = build_hierarchy(p, mask, radii, neighbor_k=16,
                            global_level=False, tile_pairs=S)
        return sum(jnp.sum(l.points) for l in h.levels[1:])

    t = chain(hier, pts)
    print(f"hierarchy:              {t*1e3:6.1f} ms", flush=True)

    def hier_pdf(p):
        h = build_hierarchy(p, mask, radii, neighbor_k=16,
                            global_level=False, tile_pairs=S)
        cache = SpatialCache(h, neighbor_k=16, tile_pairs=S)
        acc = sum(jnp.sum(l.points) for l in h.levels[1:])
        # the pdf sites MCSeg's encoder uses: level l at conv radius 2*r_l
        for lvl, r in enumerate(radii):
            acc = acc + jnp.sum(cache.pdf(lvl, 2.0 * r))
        return acc

    t = chain(hier_pdf, pts)
    print(f"hierarchy + pdfs:       {t*1e3:6.1f} ms", flush=True)

    model = MCSeg(n_classes=8, grow=16, radii=radii, tile_pairs=S)
    params = model.init(jax.random.PRNGKey(0), pts, mask)

    def fwd(p):
        out = model.apply(params, p, mask)
        logits = out[0] if isinstance(out, tuple) else out
        return jnp.sum(logits * 1e-6)

    t = chain(fwd, pts)
    print(f"forward (logits):       {t*1e3:6.1f} ms", flush=True)

    def loss_fn(logits, batch):
        return (
            segmentation_loss(logits, batch["labels"], batch["mask"]),
            {"acc": masked_accuracy(logits, batch["labels"], batch["mask"])},
        )

    batch = {"points": pts, "mask": mask, "labels": labels}
    tx = make_optimizer(lr=1e-3)
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(model, tx, loss_fn))

    @functools.partial(jax.jit, static_argnums=2)
    def step_chain(st, b, k):
        def body(c, _):
            ns, m = step(c, b)
            return ns, m["loss"]
        out, losses = jax.lax.scan(body, st, None, length=k)
        return losses.sum()

    def best_of(k, reps=3):
        float(step_chain(state, batch, k))
        bst = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(step_chain(state, batch, k))
            bst = min(bst, time.perf_counter() - t0)
        return bst

    t = (best_of(9) - best_of(3)) / 6.0
    print(f"full train step:        {t*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
