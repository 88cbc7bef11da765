"""Poisson-sampler mid-band A/B (VERDICT r4 #3): N = 2048 / 4096.

The fused on-chip sweep kernel is capped at N<=1024 (poisson_kernel.MAX_N)
and the tile cover-sweep only engages above DENSE_SAMPLER_MAX_N=4096, so the
1k-4k band — ShapeNet-scale ``--points`` and intermediate hierarchy levels of
big scenes — rides the XLA dense (B, N, N) adjacency path whose per-color
HBM re-reads the fused kernel was built to eliminate. Measures, fresh
on-chip with chain-difference timing:

  * the XLA dense sampler (the current mid-band default),
  * the tile cover-sweep sampler (the big-scene path, pulled down),

at B=8 and B=1, radii giving realistic ~27-color occupancy. The faster
backend becomes the dispatch default (core/sampling.py) and the numbers go
into docs/ROOFLINE.md.

Usage: python tools/exp_poisson_midband.py
"""
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.core.grid import (
        cell_color27,
        cell_coords,
        grid_res_for_radius,
        linear_cell_ids,
    )
    from mccnn_tpu.core.sampling import (
        _SQRT3,
        _poisson_dense,
        _poisson_tiles,
        count_poisson_sweep_steps,
    )

    def timed(fn, *args, long=96, short=24, reps=3):
        @functools.partial(jax.jit, static_argnums=1)
        def chain(x, n):
            def body(c, _):
                sel = fn(c, *args)
                # data dependence (non-zero so nothing DCEs) that leaves the
                # geometry unchanged at f32 resolution
                return c + 1e-30 * jnp.sum(sel.astype(jnp.float32)), 0

            out, _ = jax.lax.scan(body, x, None, length=n)
            return out.sum()

        def best_of(x, n):
            float(chain(x, n))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(chain(x, n))
                best = min(best, time.perf_counter() - t0)
            return best

        return lambda x: (best_of(x, long) - best_of(x, short)) / (long - short)

    rng = np.random.default_rng(0)
    for B, N, radius in [(8, 2048, 0.1), (1, 2048, 0.1), (8, 4096, 0.07),
                         (1, 4096, 0.07), (8, 2048, 0.05), (8, 4096, 0.035)]:
        pts = jnp.asarray(rng.uniform(0, 1, (B, N, 3)).astype(np.float32))
        mask = jnp.ones((B, N), bool)
        cell_edge = float(radius) / _SQRT3
        res = grid_res_for_radius(radius, cell_scale=1.0 / _SQRT3)
        coords = cell_coords(pts, cell_edge, res)
        cids = linear_cell_ids(coords, res)
        colors = cell_color27(coords)

        def dense(p):
            return _poisson_dense(p, mask, cids, colors, radius)

        t_dense = timed(dense)(pts)

        steps = int(np.asarray(
            count_poisson_sweep_steps(pts, mask, radius)).max())
        tile_pairs = steps * 8  # generous; max_steps binds

        def tiles(p):
            sel, _ = _poisson_tiles(
                p, mask, coords, cids, colors, radius, res, tile_pairs,
                False, max_steps=steps,
            )
            return sel

        try:
            t_tiles = timed(tiles)(pts)
        except Exception as e:
            print(f"B={B} N={N} r={radius}: tiles failed: {e!r}", flush=True)
            t_tiles = float("nan")

        # agreement check (same algorithm, same result)
        same = bool(jnp.array_equal(dense(pts), tiles(pts)))
        print(
            f"B={B} N={N} r={radius}: dense {t_dense*1e3:7.3f} ms | "
            f"tile {t_tiles*1e3:7.3f} ms (steps={steps}) | equal={same}",
            flush=True,
        )


def check():
    """--check: boundary analysis of any equal=False configs (r5 found two).

    Re-runs the tile sampler with (a) the tool's crude tile_pairs sizing and
    (b) a lossless budget, printing overflow + equality vs dense each time;
    residual mismatches get a boundary analysis — for each differing point,
    the distance to the nearest selected point in the OTHER selection,
    relative to the radius (|d - r| ~ ulp => dense-matmul-vs-kernel-per-axis
    f32 rounding on the disk boundary, not a coverage bug)."""
    import jax.numpy as jnp

    from mccnn_tpu.core.grid import (
        cell_color27, cell_coords, grid_res_for_radius, linear_cell_ids,
    )
    from mccnn_tpu.core.sampling import (
        _SQRT3, _poisson_dense, _poisson_tiles, count_poisson_sweep_steps,
    )

    configs = [(8, 2048, 0.1), (1, 2048, 0.1), (8, 4096, 0.07),
               (1, 4096, 0.07), (8, 2048, 0.05), (8, 4096, 0.035)]
    failing = {(8, 4096, 0.07), (8, 2048, 0.05)}  # r5 measured

    rng = np.random.default_rng(0)  # the tool's exact rng stream
    for B, N, radius in configs:
        pts = jnp.asarray(rng.uniform(0, 1, (B, N, 3)).astype(np.float32))
        if (B, N, radius) not in failing:
            continue
        mask = jnp.ones((B, N), bool)
        cell_edge = float(radius) / _SQRT3
        res = grid_res_for_radius(radius, cell_scale=1.0 / _SQRT3)
        coords = cell_coords(pts, cell_edge, res)
        cids = linear_cell_ids(coords, res)
        colors = cell_color27(coords)

        d_sel = np.asarray(_poisson_dense(pts, mask, cids, colors, radius))
        steps = int(np.asarray(count_poisson_sweep_steps(pts, mask, radius)).max())
        nt, nt_m = -(-N // 128), -(-N // 32)

        for label, tile_pairs, max_steps in [
            ("tool  (steps*8)", steps * 8, steps),
            ("lossless", nt * nt_m, steps),
        ]:
            sel, ovf = _poisson_tiles(
                pts, mask, coords, cids, colors, radius, res, tile_pairs,
                False, max_steps=max_steps,
            )
            sel = np.asarray(sel)
            ovf = int(np.asarray(ovf).max())
            eq = bool((sel == d_sel).all())
            print(f"B={B} N={N} r={radius} [{label}]: overflow={ovf} "
                  f"equal={eq} n_sel_tile={sel.sum()} "
                  f"n_sel_dense={d_sel.sum()}", flush=True)
            if not eq and ovf == 0:
                pts_np = np.asarray(pts)
                diff_b, diff_i = np.nonzero(sel != d_sel)
                print(f"  {len(diff_b)} differing points; boundary analysis "
                      f"(first 8):", flush=True)
                for b, i in list(zip(diff_b, diff_i))[:8]:
                    p = pts_np[b, i]
                    for name, other in [("dense", d_sel), ("tile", sel)]:
                        osel = other[b].copy()
                        osel[i] = False
                        if not osel.any():
                            continue
                        d = np.sqrt(((pts_np[b][osel] - p) ** 2).sum(-1)).min()
                        print(f"    b={b} i={i} "
                              f"sel_dense={bool(d_sel[b, i])} "
                              f"nearest {name}-selected: d={d:.9f} "
                              f"d-r={d - radius:+.3e}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    check() if "--check" in sys.argv else main()
