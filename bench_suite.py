"""Extended benchmark suite (human-readable; the driver-facing single-line
benchmark stays in bench.py).

Measures the op zoo and an end-to-end model step across representative
configurations on the local chip, each via lax.scan chains (this
environment's ~30 ms dispatch overhead would otherwise dominate).

Usage: python bench_suite.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def chain_time(fn, carrier, n_short=8, n_long=40, repeats=2):
    """Steady-state per-iteration seconds via chain-length difference —
    cancels this environment's fixed ~27 ms dispatch round-trip exactly
    (see docs/ROOFLINE.md for why dividing one chain's total misleads)."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=1)
    def chained(p, n):
        def body(c, _):
            return c + 1e-9 * fn(c), 0

        o, _ = jax.lax.scan(body, p, None, length=n)
        return o.sum()

    def best_of(n):
        float(chained(carrier, n))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chained(carrier, n))
            best = min(best, time.perf_counter() - t0)
        return best

    return (best_of(n_long) - best_of(n_short)) / (n_long - n_short)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument(
        "--only", default=None, choices=("1k", "4k", "32k", "model"),
        help="run a single section (each TPU compile is slow here)",
    )
    ap.add_argument(
        "--full", action="store_true",
        help="include the 32k bucket-kernel variants (5-10 min compiles "
        "each; the z-tile kernel supersedes them — see docs/ROOFLINE.md)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mccnn_tpu.api import build_hierarchy
    from mccnn_tpu.core import (
        init_mcconv_params,
        kde_density,
        mc_conv,
        poisson_disk,
        radius_neighbors,
    )
    from mccnn_tpu.core.buckets import build_buckets
    from mccnn_tpu.models import MCClassS
    from mccnn_tpu.ops.pallas import bucket_mc_conv, dense_mc_conv

    print(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    rows = []

    def emit(name, t, rate):
        rows.append((name, t, rate))
        print(f"{name:42s} {t * 1e3:9.3f} ms {rate:8.1f} Mpts/s", flush=True)

    def surface_scene(n):
        """Room-like 2D-manifold cloud (floor + 4 walls + jitter) — the
        ScanNet-like occupancy profile; volume-uniform clouds under-fill
        cells and overstate slot-padding waste."""
        face = rng.integers(0, 5, size=n)
        u, v = rng.uniform(0, 1, (2, n))
        p = np.zeros((n, 3), np.float32)
        p[face == 0] = np.stack([u, v, np.zeros_like(u)], -1)[face == 0]
        p[face == 1] = np.stack([np.zeros_like(u), u, v], -1)[face == 1]
        p[face == 2] = np.stack([np.ones_like(u), u, v], -1)[face == 2]
        p[face == 3] = np.stack([u, np.zeros_like(u), v], -1)[face == 3]
        p[face == 4] = np.stack([u, np.ones_like(u), v], -1)[face == 4]
        p += rng.normal(0, 0.01, size=p.shape)
        return np.clip(p, 0.0, 0.999).astype(np.float32)

    def bench_config(
        B, N, C, radius, tag, cap=16, jnp_path=True, aux=True, surface=False,
        n_short=8, n_long=40, active_bricks=False, tile_path=False,
        bucket_path=True,
    ):
        if surface:
            pts = jnp.asarray(np.stack([surface_scene(N) for _ in range(B)]))
        else:
            pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
        mask = jnp.asarray(np.ones((B, N), bool))
        feats = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
        pdf = jnp.asarray(np.ones((B, N), np.float32))
        params = init_mcconv_params(jax.random.PRNGKey(0), C, None)
        mpts = B * N / 1e6

        # FULL fwd+bwd chains (params AND feature grads — feature-only lets
        # XLA dead-code-eliminate the dparam work; see docs/ROOFLINE.md)
        def fb(conv):
            def loss(p, f):
                return jnp.sum(conv(p, f) ** 2)

            g = jax.grad(loss, argnums=(0, 1))

            def step(f):
                gp, gf = g(params, f)
                return gf.sum() + jnp.sum(gp.w1) + jnp.sum(gp.w2)

            return chain_time(step, feats, n_short=n_short, n_long=n_long)

        if tile_path:
            # first: the big-scene WINNER (fast compiles) so time-bounded
            # runs still produce the headline number
            from mccnn_tpu.ops.pallas import count_tile_pairs, tile_mc_conv

            S = int(count_tile_pairs(pts, mask, pts, mask, radius).max())
            t = fb(
                lambda p, f: tile_mc_conv(
                    p, pts, mask, pts, mask, f, pdf, radius, max_pairs=S
                )
            )
            emit(f"conv z-tile({S}) fwd+bwd {tag}", t, mpts / t)
        if N <= 4096:
            t = fb(lambda p, f: dense_mc_conv(p, pts, mask, pts, mask, f, pdf, radius))
            emit(f"conv dense fwd+bwd {tag}", t, mpts / t)
        if bucket_path:
            # big-scene bucket configs take 5-10 min PER chained compile —
            # see docs/ROOFLINE.md for their measured shoot-out numbers
            grid = build_buckets(pts, mask, radius, cap=cap)
            assert int(grid.overflow.sum()) == 0, "raise cap for this config"
            t = fb(lambda p, f: bucket_mc_conv(p, grid, mask, grid, f, pdf))
            emit(f"conv bucket fwd+bwd {tag}", t, mpts / t)
        if bucket_path and active_bricks:
            from mccnn_tpu.ops.pallas.mcconv_kernel import count_active_bricks

            nba = int(count_active_bricks(grid).max())
            t = fb(
                lambda p, f: bucket_mc_conv(
                    p, grid, mask, grid, f, pdf, max_active_bricks=nba
                )
            )
            emit(f"conv bucket-active({nba}) fwd+bwd {tag}", t, mpts / t)
        if jnp_path:
            nbh = radius_neighbors(pts, mask, pts, mask, radius, 32)
            t = fb(lambda p, f: mc_conv(p, pts, nbh, pts, f, pdf))
            emit(f"conv jnp fwd+bwd {tag}", t, mpts / t)
        if aux:
            t = chain_time(lambda p: kde_density(p, mask, radius).sum(), pts)
            emit(f"kde {tag}", t, mpts / t)
            t = chain_time(
                lambda p: poisson_disk(p, mask, radius / 2, N // 2).idx.sum().astype(jnp.float32),
                pts,
            )
            emit(f"poisson {tag}", t, mpts / t)

    only = args.only
    if only in (None, "1k"):
        bench_config(8, 1024, 128, 0.2, "B8 N1k C128", cap=24)
    if (not args.quick and only is None) or only == "4k":
        bench_config(4, 4096, 128, 0.1, "B4 N4k C128", tile_path=True)
    if (not args.quick and only is None) or only == "32k":
        # ScanNet-scale single cloud (VERDICT r1 #6): dense is out of its
        # depth here (overcompute ~N/K ~ 1900x) — the bucket path is the
        # big-scene story. jnp/kde/poisson O(N^2) paths skipped.
        bench_config(
            1, 32768, 128, 0.05, "B1 N32k C128 surface", cap=64,
            jnp_path=False, aux=False, surface=True, n_short=2, n_long=10,
            active_bricks=True, tile_path=True, bucket_path=args.full,
        )
    if only == "32k":
        return

    # end-to-end model step
    if only not in (None, "model"):
        return
    B, N = 8, 1024
    pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    model = MCClassS(n_classes=40)
    v = model.init(jax.random.PRNGKey(0), pts, mask, train=False)
    labels = jnp.asarray(rng.integers(0, 40, size=B))

    def loss_fn(params, p):
        logits = model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, p, mask, train=False
        )
        import jax.nn

        return -jax.nn.log_softmax(logits)[jnp.arange(B), labels].mean()

    grad = jax.grad(loss_fn)

    @functools.partial(jax.jit, static_argnums=1)
    def step_chain(params, n, p):
        def body(c, _):
            return jax.tree.map(lambda a, b: a - 1e-3 * b, c, grad(c, p)), 0

        o, _ = jax.lax.scan(body, params, None, length=n)
        return loss_fn(o, p)

    float(step_chain(v["params"], 10, pts))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(step_chain(v["params"], 10, pts))
        best = min(best, (time.perf_counter() - t0) / 10)
    emit("MCClassS full train step B8 N1k", best, B * N / 1e6 / best)

    print(f"\n{'benchmark':42s} {'ms':>9s} {'Mpts/s':>8s}")
    for name, t, rate in rows:
        print(f"{name:42s} {t * 1e3:9.3f} {rate:8.1f}")


if __name__ == "__main__":
    main()
