"""Split the level-1 tile-Poisson 27-step loop cost (run on real TPU):
(a) 27x the cover-sweep ``counts`` kernel alone,
(b) 27x the segment_min + take_along_axis cell-min query alone,
(c) the real _poisson_tiles for reference.

Usage: python tools/exp_poisson_breakdown.py [n_points] [sampler_pairs]
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


def bench(make_fn, x, n=3, reps=3):
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(c, _):
            return c + 1e-12 * make_fn(c), 0
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

    return (best_of(3 * n) - best_of(n)) / (2 * n)


def main():
    from mccnn_tpu.core.grid import (cell_color27, cell_coords,
                                     grid_res_for_radius, linear_cell_ids)
    from mccnn_tpu.core.sampling import poisson_disk
    from mccnn_tpu.ops.pallas import count_tile_pairs
    from mccnn_tpu.ops.pallas.tile_conv import make_cover_sweep

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    rng = np.random.default_rng(0)
    pts = jnp.asarray(surface_scene(rng, N))[None]
    mask = jnp.ones((1, N), bool)
    r = 0.05
    S_conv = int(count_tile_pairs(pts, mask, pts, mask, 2 * r).max())
    S_samp = int(count_tile_pairs(pts, mask, pts, mask, r).max())
    if len(sys.argv) > 2:
        S_samp = int(sys.argv[2])
    print(f"N={N} conv-radius pairs={S_conv} sampler-radius pairs={S_samp}",
          flush=True)

    import math
    cell_edge = r / math.sqrt(3.0)
    res = grid_res_for_radius(r, cell_scale=1.0 / math.sqrt(3.0))
    n_cells = res * res * res
    print(f"res={res} n_cells={n_cells}", flush=True)

    for S in (S_conv, S_samp):
        def counts27(p, S=S):
            sw = make_cover_sweep(p, mask, r, max_pairs=S)
            nt_rows = sw.valid.shape[1]

            def body(i, acc):
                c = sw.counts((acc > i).astype(jnp.float32))
                return acc + c
            out = jax.lax.fori_loop(0, 27, body,
                                    jnp.zeros((1, nt_rows), jnp.float32))
            return jnp.sum(out)

        t = bench(counts27, pts)
        print(f"27x counts sweep (S={S}):     {t*1e3:6.1f} ms", flush=True)

    def segmin27(p):
        coords = cell_coords(p, cell_edge, res)
        cids = linear_cell_ids(coords, res)
        key0 = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (1, N))

        def body(i, acc):
            key = jnp.where(acc > i, key0, jnp.int32(2**30))
            cell_min = jax.vmap(
                lambda k_, c_: jax.ops.segment_min(k_, c_, num_segments=n_cells)
            )(key, cids)
            is_min = key == jnp.take_along_axis(cell_min, cids, axis=1)
            return acc + is_min.astype(jnp.int32)

        out = jax.lax.fori_loop(0, 27, body, jnp.zeros((1, N), jnp.int32))
        return jnp.sum(out.astype(jnp.float32))

    t = bench(segmin27, pts)
    print(f"27x segment_min+gather:       {t*1e3:6.1f} ms", flush=True)

    def full(p):
        ss = poisson_disk(p, mask, r, 1944, tile_pairs=S_conv)
        return jnp.sum(jnp.where(ss.mask, 1.0, 0.0))

    t = bench(full, pts)
    print(f"_poisson_tiles total (S_conv): {t*1e3:6.1f} ms", flush=True)


def tile_ab():
    """A/B the cover-sweep tile size: 27x counts at T in {128,256,512} with
    right-sized S each. Run: python tools/exp_poisson_breakdown.py --tile-ab"""
    from mccnn_tpu.ops.pallas import count_tile_pairs
    from mccnn_tpu.ops.pallas.tile_conv import make_cover_sweep

    N = 32768
    rng = np.random.default_rng(0)
    pts = jnp.asarray(surface_scene(rng, N))[None]
    mask = jnp.ones((1, N), bool)
    r = 0.05
    for T in (128, 256, 512, 1024):
        S = int(count_tile_pairs(pts, mask, pts, mask, r, tile=T).max())

        def counts27(p, S=S, T=T):
            sw = make_cover_sweep(p, mask, r, max_pairs=S, tile=T)
            nt_rows = sw.valid.shape[1]

            def body(i, acc):
                c = sw.counts((acc > i).astype(jnp.float32))
                return acc + c
            out = jax.lax.fori_loop(0, 27, body,
                                    jnp.zeros((1, nt_rows), jnp.float32))
            return jnp.sum(out)

        t = bench(counts27, pts)
        print(f"T={T:4d} S={S:5d}: 27x counts = {t*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    if "--tile-ab" in sys.argv:
        tile_ab()
    else:
        main()
