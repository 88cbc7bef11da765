"""Measure tile-pair pruning tightness on the canonical 32k bench scene.

Three conservative adjacency tests, strict supersets of the true pair set:
  aabb  — current: dilated AABB-vs-AABB intersection
  ptbox — point-vs-AABB (both directions): pair (i,j) survives iff some
          point of i is within r of AABB_j AND some point of j within r of
          AABB_i. Strictly tighter than aabb, still conservative.
  exact — min pairwise point distance <= r (the minimal lossless pair set).

Also accounts chunked grid steps (G): needed = sum_rows ceil(row_cnt/G)
vs the static S the kernel currently compiles with.

CPU-only (numpy + jax cpu for the Hilbert order). Run:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_tile_adjacency.py
"""

from __future__ import annotations

import numpy as np


def bench_scene(nb=32768, seed=1):
    rng = np.random.default_rng(seed)
    face = rng.integers(0, 5, size=nb)
    u, v = rng.uniform(0, 1, (2, nb))
    p = np.zeros((nb, 3), np.float32)
    for f_, arr in [
        (0, np.stack([u, v, np.zeros_like(u)], -1)),
        (1, np.stack([np.zeros_like(u), u, v], -1)),
        (2, np.stack([np.ones_like(u), u, v], -1)),
        (3, np.stack([u, np.zeros_like(u), v], -1)),
        (4, np.stack([u, np.ones_like(u), v], -1)),
    ]:
        p[face == f_] = arr[face == f_]
    p += rng.normal(0, 0.01, size=p.shape)
    return np.clip(p, 0.0, 0.999).astype(np.float32)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mccnn_tpu.ops.pallas.tile_conv import curve_order

    T, G, R = 128, 8, 0.05
    p = bench_scene()
    N = p.shape[0]
    nt = N // T
    mask = jnp.ones((1, N), bool)
    order = np.asarray(curve_order(jnp.asarray(p)[None], mask))[0]
    ps = p[order].reshape(nt, T, 3)

    mn = ps.min(axis=1)  # (nt, 3)
    mx = ps.max(axis=1)

    # --- aabb (current) ---
    lo = mn[:, None, :] - R <= mx[None, :, :]
    hi = mx[:, None, :] + R >= mn[None, :, :]
    adj_aabb = np.all(lo & hi, axis=-1)

    # --- ptbox ---
    # d2(point p of tile i, AABB_j) over all points x all tiles
    flat = ps.reshape(N, 3)
    dlo = np.maximum(mn[None, :, :] - flat[:, None, :], 0.0)
    dhi = np.maximum(flat[:, None, :] - mx[None, :, :], 0.0)
    d2box = ((dlo + dhi) ** 2).sum(-1)  # (N, nt)
    near = (d2box <= R * R).reshape(nt, T, nt).any(axis=1)  # (nt_i, nt_j)
    adj_ptbox = near & near.T & adj_aabb

    # --- exact (only refine pairs that survive ptbox) ---
    adj_exact = np.zeros_like(adj_aabb)
    ii, jj = np.nonzero(adj_ptbox)
    for i, j in zip(ii, jj):
        if j < i:
            continue  # symmetric scene (self-conv): fill both at once
        d2 = ((ps[i][:, None, :] - ps[j][None, :, :]) ** 2).sum(-1)
        hit = bool((d2 <= R * R).any())
        adj_exact[i, j] = hit
        adj_exact[j, i] = hit

    def steps(adj):
        cnt = adj.sum(axis=1)
        return int(np.ceil(cnt / G).sum())

    def report(name, adj):
        pairs = int(adj.sum())
        print(
            f"{name:6s} pairs={pairs:6d}  ({pairs / adj_aabb.sum():.3f}x aabb)"
            f"  needed_steps(G={G})={steps(adj)}"
        )

    report("aabb", adj_aabb)
    report("ptbox", adj_ptbox)
    report("exact", adj_exact)

    # static S the kernel would compile with today (auto-sized max_pairs)
    pairs_now = int(adj_aabb.sum())
    auto = -(-int(pairs_now * 1.3 + 1) // 256) * 256
    S_now = min(-(-auto // G) + nt, nt * (-(-nt // G)))
    print(f"current: auto max_pairs={auto}  static S={S_now} "
          f"(needed {steps(adj_aabb)})")
    # true neighbor pair count for the overcompute ratio
    # (blockwise to keep memory sane)
    true_pairs = 0
    for i in range(nt):
        d2 = ((ps[i].reshape(T, 1, 1, 3) - ps.reshape(1, nt, T, 3)) ** 2).sum(-1)
        true_pairs += int((d2 <= R * R).sum())
    for name, adj in [("aabb", adj_aabb), ("ptbox", adj_ptbox),
                      ("exact", adj_exact)]:
        cand = int(adj.sum()) * T * T
        print(f"{name:6s} candidate pts {cand/1e6:.1f} M  overcompute "
              f"{cand / true_pairs:.1f}x")
    print(f"true neighbor pairs {true_pairs/1e6:.2f} M")

    # chunk-size sweep under the ptbox pair set: steps (per-step fixed cost)
    # vs slots = steps*G (G-proportional compute). The kernel's real cost is
    # a*steps + b*slots; measure the endpoints on-chip to fit a/b.
    cnt = adj_ptbox.sum(axis=1)
    print("\nG sweep (ptbox pairs, fwd direction):")
    for g in (2, 4, 6, 8, 12, 16):
        st = int(np.ceil(cnt / g).sum())
        print(
            f"  G={g:2d} steps={st:5d} slots={st * g:6d} "
            f"occupancy={int(adj_ptbox.sum()) / (st * g):.2f}"
        )


if __name__ == "__main__":
    main()
