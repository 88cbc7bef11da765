"""Small-N hierarchy breakdown (VERDICT r3 #2): what inside build_hierarchy
costs 43% of the MCClassS step at B=8 N=1024?

Chain-difference timings of each sub-component on the real chip:
  poisson L0 (N=1024, pallas sweep), poisson L1 (~500 pts), the level KDEs,
  the sampled-point gathers, full build_hierarchy, full train step.

Usage: python tools/exp_smalln_hier.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from profile_step import chain_diff  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from mccnn_tpu.api import SpatialCache, build_hierarchy
    from mccnn_tpu.api.hierarchy import default_level_caps
    from mccnn_tpu.core.pdf import kde_density
    from mccnn_tpu.core.sampling import poisson_disk

    B, N = 8, 1024
    radii = (0.1, 0.4)
    k = 32
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1, size=(B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    caps = default_level_caps(N, radii)
    print("level caps:", caps)

    rows = []

    def scalarize(p, s):
        return p * 0 + s

    # Poisson L0 -> L1
    def pois0(p):
        ss = poisson_disk(p, mask, radii[0], caps[0])
        return scalarize(p, ss.mask.sum().astype(jnp.float32))

    rows.append(("poisson L0 (N=1024)", chain_diff(pois0, pts)))

    # materialize level 1 once for the L1 probe
    ss1 = poisson_disk(pts, mask, radii[0], caps[0])
    pts1 = jnp.where(
        ss1.mask[..., None],
        jnp.take_along_axis(pts, ss1.idx[..., None].repeat(3, -1), axis=1),
        0.0,
    )
    m1 = ss1.mask

    def pois1(p1):
        ss = poisson_disk(p1, m1, radii[1], caps[1])
        return scalarize(p1, ss.mask.sum().astype(jnp.float32))

    rows.append((f"poisson L1 (cap={caps[0]})", chain_diff(pois1, pts1)))

    def gath(p):
        ss = poisson_disk(p, mask, radii[0], caps[0])
        nxt = jnp.where(
            ss.mask[..., None],
            jnp.take_along_axis(p, ss.idx[..., None].repeat(3, -1), axis=1),
            0.0,
        )
        return scalarize(p, nxt.sum())

    rows.append(("poisson L0 + gather", chain_diff(gath, pts)))

    # KDE pdfs at the conv radii (what SpatialCache.pdf computes)
    def kdes(p):
        s = kde_density(p, mask, radii[0] * 2.0).sum()
        return scalarize(p, s)

    rows.append(("kde L0 (N=1024, r=0.2)", chain_diff(kdes, pts)))

    def kdes1(p1):
        s = kde_density(p1, m1, radii[1] * 2.0).sum()
        return scalarize(p1, s)

    rows.append((f"kde L1 (cap={caps[0]}, r=0.8)", chain_diff(kdes1, pts1)))

    def hier(p):
        h = build_hierarchy(p, mask, radii, neighbor_k=k, global_level=True)
        return scalarize(p, sum(l.points.sum() for l in h.levels))

    rows.append(("build_hierarchy total", chain_diff(hier, pts)))

    def hier_pdf(p):
        h = build_hierarchy(p, mask, radii, neighbor_k=k, global_level=True)
        cache = SpatialCache(h, neighbor_k=k)
        s = 0.0
        for lvl in range(len(radii)):
            s = s + cache.pdf(lvl, radii[lvl] * 2.0).sum()
        return scalarize(p, s)

    rows.append(("hierarchy + pdfs", chain_diff(hier_pdf, pts)))

    print(f"\nB={B} N={N} radii={radii} on {jax.devices()[0]}")
    for name, t in rows:
        print(f"{name:32s} {t * 1e3:9.3f} ms")


if __name__ == "__main__":
    main()
