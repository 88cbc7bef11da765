"""Cover-sweep major-tile A/B at the 32k bench scene (round 5, post-minor).

Round 3 A/B'd T=256 and lost — but candidates then rode T-granularity rows,
so raising T doubled candidate bytes AND halved pruning precision. With
round-5 minor sub-tiles the candidate side is Tm=32 regardless of T, and the
sampler now sits at its 27 x nt major-tile step floor (host counts: T=128
268 steps vs floor 256). Raising T attacks the floor directly:

  T=128/Gm=32 (current): 268 steps, 8576 slots
  T=256/Gm=64:           128 steps, 8192 slots
  T=512/Gm=64:            66 steps, 4224 slots

This measures the 27-color ``TileCoverSweep.counts`` loop (the part the
floor binds — ~all of the sampler's on-chip time, ROUND3.md) per config,
fresh on-chip, chain-differenced, after validating that the (cov > 0)
coverage masks are IDENTICAL across configs (the sweep is exact at any T).

Usage: python tools/exp_cover_tile.py [n_points]
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from mccnn_tpu.core.grid import cell_coords, grid_res_for_radius
    from mccnn_tpu.core.sampling import _SQRT3, _cell_hilbert_order
    from mccnn_tpu.ops.pallas.tile_conv import (
        _needed_steps,
        _refined_adjacency,
        _sorted_tiles,
        make_cover_sweep,
        tile_minor,
    )

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    r = 0.05
    rng = np.random.default_rng(2)
    pts = jnp.asarray(bench._surface_scene(rng, N))[None]
    mask = jnp.ones((1, N), bool)

    cell_edge = float(r) / _SQRT3
    res = grid_res_for_radius(r, cell_scale=1.0 / _SQRT3)
    coords = cell_coords(pts, cell_edge, res)
    order = _cell_hilbert_order(coords, mask, res)

    def exact_steps(T, Gm):
        Tm = tile_minor(T)
        nt, nt_m = -(-N // T), -(-N // Tm)
        rows, _, mn, mx = _sorted_tiles(pts, mask, order, T, nt * T)
        rows_m, _, mn_m, mx_m = _sorted_tiles(pts, mask, order, Tm, nt_m * Tm)
        adj = _refined_adjacency(rows, mn, mx, rows_m, mn_m, mx_m, T, r, Tm)
        return int(np.asarray(_needed_steps(adj, Gm)).max())

    # a deterministic, reproducible flag pattern in the SORTED domain that
    # stays identical across configs (nt*T == N for every T tried here)
    fl_rng = np.random.default_rng(7)
    base_flags = jnp.asarray(fl_rng.random(N) < 0.05, jnp.float32)[None]

    configs = [(128, 8), (256, 16), (256, 8), (512, 16), (512, 8)]
    ref_cov = None
    results = []
    for T, chunk in configs:
        Tm = tile_minor(T)
        Gm = chunk * (T // Tm)
        steps = exact_steps(T, Gm)
        sweep = make_cover_sweep(
            pts, mask, r, max_pairs=1 << 30, max_steps=steps, order=order,
            tile=T, chunk=chunk,
        )
        assert int(sweep.spec.S) == steps, (T, chunk, sweep.spec.S, steps)

        cov = np.asarray(jax.jit(sweep.counts)(base_flags)) > 0.0
        if ref_cov is None:
            ref_cov = cov
            print(f"T={T} Gm={Gm}: coverage reference "
                  f"({int(cov.sum())} covered)", flush=True)
        else:
            same = bool((cov == ref_cov).all())
            print(f"T={T} Gm={Gm}: coverage == T128 reference: {same}",
                  flush=True)
            if not same:
                print("  MISMATCH — skipping timing", flush=True)
                continue

        @functools.partial(jax.jit, static_argnums=1)
        def loop(c, n, sweep=sweep):
            def body(carry, i):
                flags = (jnp.sign(carry) + 1.0) * 0.5 * base_flags
                cov = sweep.counts(flags)
                return carry + 1e-20 * cov - 2e-20 * jnp.abs(carry), 0

            out, _ = jax.lax.scan(body, c, jnp.arange(n), length=n)
            return out.sum()

        c0 = jnp.zeros_like(base_flags)

        def best_of(n, reps=3):
            float(loop(c0, n))
            b = 1e9
            for _ in range(reps):
                t0 = time.perf_counter()
                float(loop(c0, n))
                b = min(b, time.perf_counter() - t0)
            return b

        per27 = (best_of(81) - best_of(27)) / 2.0
        print(f"  27x counts: {per27 * 1e3:7.2f} ms  "
              f"(steps={steps}, slots={steps * Gm})", flush=True)
        results.append((T, Gm, steps, per27))

    best = min(results, key=lambda x: x[-1])
    cur = [x for x in results if x[0] == 128][0]
    print(f"\nbest: T={best[0]} Gm={best[1]} {best[3]*1e3:.2f} ms "
          f"vs current T=128 {cur[3]*1e3:.2f} ms "
          f"({cur[3]/best[3]:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
