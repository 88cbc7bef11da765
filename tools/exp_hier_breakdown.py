"""Where do the 63 ms of 32k hierarchy build go? (run on real TPU)

Chain-difference times, per component:
  * make_cover_sweep setup alone (Hilbert sort + tile AABBs + pair list)
  * the full level-0->1 tile Poisson sample (setup + 27-color sweep loop)
  * level-1 gather + the two small-level samplers (rest of build_hierarchy)
  * build_hierarchy total

Usage: python tools/exp_hier_breakdown.py [n_points]
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


def chain(fn, x, n):
    @functools.partial(jax.jit, static_argnums=1)
    def run(p, k):
        def body(c, _):
            return c + 1e-12 * fn(c), 0
        out, _ = jax.lax.scan(body, p, None, length=k)
        return out.sum()

    def best_of(k, reps=3):
        float(run(x, k))
        b = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, k))
            b = min(b, time.perf_counter() - t0)
        return b

    return (best_of(3 * n) - best_of(n)) / (2 * n)


def main():
    from mccnn_tpu.api.hierarchy import build_hierarchy
    from mccnn_tpu.core.sampling import poisson_disk
    from mccnn_tpu.ops.pallas import count_tile_pairs
    from mccnn_tpu.ops.pallas.tile_conv import make_cover_sweep

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    rng = np.random.default_rng(0)
    pts = jnp.asarray(surface_scene(rng, N))[None]
    mask = jnp.ones((1, N), bool)
    r0c = 0.05 * 2.0
    S = int(count_tile_pairs(pts, mask, pts, mask, r0c).max())
    print(f"N={N} tile_pairs={S}", flush=True)
    radii = (0.05, 0.15, 0.4)

    t = chain(lambda p: jnp.sum(make_cover_sweep(
        p, mask, radii[0], max_pairs=S).rows), pts, 3)
    print(f"cover-sweep setup alone:      {t*1e3:6.1f} ms", flush=True)

    t = chain(lambda p: jnp.sum(jnp.where(
        poisson_disk(p, mask, radii[0], 1944, tile_pairs=S).mask, 1.0, 0.0)),
        pts, 3)
    print(f"level-1 tile poisson total:   {t*1e3:6.1f} ms", flush=True)

    def full(p):
        h = build_hierarchy(p, mask, radii, neighbor_k=16,
                            global_level=False, tile_pairs=S)
        return sum(jnp.sum(l.points) for l in h.levels[1:])

    t = chain(full, pts, 3)
    print(f"build_hierarchy total:        {t*1e3:6.1f} ms", flush=True)


if __name__ == "__main__":
    main()
