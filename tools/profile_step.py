"""MCClassS train-step breakdown: hierarchy build vs the rest (VERDICT r1 #7).

Chain-difference timing (docs/ROOFLINE.md) of:
  * build_hierarchy alone (Poisson levels + global centroid)
  * SpatialCache spatial queries (pdf per level+radius) given the hierarchy
  * the full forward, and the full train step (fwd+bwd+adam)

Usage: python tools/profile_step.py [--points 1024] [--batch 8] [--grow 16]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_diff(fn, carrier, n_short=8, n_long=40, repeats=3):
    import jax

    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=1)
    def chained(c, n):
        def body(c, _):
            # perturb float leaves to keep a true data dependence between
            # iterations; integer/uint leaves (step counters, rng keys) pass
            # through the new value unchanged (dtype must round-trip the scan)
            def mix(a, b):
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating):
                    return a + 1e-9 * b
                return b

            return jax.tree.map(mix, c, fn(c)), 0

        o, _ = jax.lax.scan(body, c, None, length=n)
        return jax.tree.map(lambda x: x.sum(), o)

    def best_of(n):
        jax.block_until_ready(chained(carrier, n))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(chained(carrier, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(n_long) - best_of(n_short)) / (n_long - n_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--grow", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from mccnn_tpu.api import SpatialCache, build_hierarchy
    from mccnn_tpu.models import MCClassS
    from mccnn_tpu.train import (
        classification_loss,
        init_state,
        make_optimizer,
        make_train_step,
    )

    B, N, g = args.batch, args.points, args.grow
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    labels = jnp.asarray(rng.integers(0, 6, size=B), jnp.int32)
    model = MCClassS(n_classes=6, grow=g)
    radii, k = model.radii, model.neighbor_k

    rows = []

    def hier_fn(p):
        h = build_hierarchy(p, mask, radii, neighbor_k=k, global_level=True)
        # reduce to a differentiable-free scalar pytree of same struct as p
        return p * 0 + sum(l.points.sum() for l in h.levels)

    rows.append(("build_hierarchy", chain_diff(hier_fn, pts)))

    def hier_pdf_fn(p):
        h = build_hierarchy(p, mask, radii, neighbor_k=k, global_level=True)
        cache = SpatialCache(h, neighbor_k=k)
        s = 0.0
        for lvl in range(len(radii)):
            r = radii[lvl] * model.conv_radius_scale
            s = s + cache.pdf(lvl, r).sum()
        return p * 0 + s

    rows.append(("hierarchy + level pdfs", chain_diff(hier_pdf_fn, pts)))

    variables = model.init(jax.random.PRNGKey(0), pts, mask, train=False)

    def fwd_fn(p):
        out = model.apply(variables, p, mask, train=False)
        return p * 0 + out.sum()

    rows.append(("full forward", chain_diff(fwd_fn, pts)))

    tx = make_optimizer(lr=1e-3)
    batch = {"points": pts, "mask": mask, "labels": labels}
    state = init_state(model, tx, jax.random.PRNGKey(0), batch)

    def loss_fn(logits, b):
        return classification_loss(logits, b["labels"]), {}

    step = make_train_step(model, tx, loss_fn)

    def step_fn(s):
        new_s, _ = step(s, batch)
        return new_s

    rows.append(("full train step", chain_diff(step_fn, state)))

    total = rows[-1][1]
    print(f"\nMCClassS B={B} N={N} grow={g} on {jax.devices()[0]}")
    print(f"{'phase':28s} {'ms':>9s} {'% of step':>10s}")
    for name, t in rows:
        print(f"{name:28s} {t * 1e3:9.3f} {100 * t / total:9.1f}%")


if __name__ == "__main__":
    main()
