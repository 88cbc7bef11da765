"""On-chip A/B of the dense Poisson sweep variants (round 4, v3 candidate).

Times poisson_sweep_pallas (the kernel PLUS the v3 wrapper's sort/unsort
overhead, which is part of the deal) at the MCClassS L0 scale (B=8 N=1024)
for v1 and v3, checks selections are identical on-chip, then times
build_hierarchy and the full train-step probe under each variant.

Usage: python tools/exp_poisson_v3.py [--quick]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

from profile_step import chain_diff  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="sweep-only (skip hierarchy/train-step probes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mccnn_tpu.core.grid import (cell_color27, cell_coords,
                                     grid_res_for_radius, linear_cell_ids)
    from mccnn_tpu.ops.pallas.poisson_kernel import poisson_sweep_pallas

    B, N = 8, 1024
    radius = 0.1
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(0, 1, (B, N, 3)).astype(np.float32))
    mask = jnp.asarray(np.ones((B, N), bool))
    cell_edge = radius / math.sqrt(3.0)
    res = grid_res_for_radius(radius, cell_scale=1.0 / math.sqrt(3.0))
    coords = cell_coords(pts, cell_edge, res)
    cids = linear_cell_ids(coords, res)
    colors = cell_color27(coords)
    print(f"B={B} N={N} radius={radius} res={res}", flush=True)

    sels = {}
    for variant in ("v1", "v3"):
        os.environ["MCCNN_POISSON_SWEEP"] = variant

        def sweep(p):
            sel = poisson_sweep_pallas(p, mask, cids, colors, radius)
            return p * 0 + sel.sum().astype(jnp.float32)

        # correctness on-chip first (one dispatch)
        sel = np.asarray(
            jax.jit(lambda p: poisson_sweep_pallas(
                p, mask, cids, colors, radius))(pts)
        )
        sels[variant] = sel
        print(f"{variant}: n_selected={sel.sum()}", flush=True)
        ms = chain_diff(sweep, pts) * 1e3
        print(f"{variant}: sweep {ms:.3f} ms", flush=True)

    assert (sels["v1"] == sels["v3"]).all(), "v1/v3 selections differ on-chip"
    print("selections identical on-chip", flush=True)

    # --- prep-only probe: the v3 wrapper's sort/gather/counts/unsort with a
    # dummy in place of the kernel — isolates wrapper overhead from kernel ---
    from mccnn_tpu.ops.pallas.mcconv_kernel import LANE, transposed_tiles

    Np = N
    import jax.numpy as jnp2

    def prep_only(p):
        pad = jnp.concatenate(
            [p, jnp.zeros((B, Np, LANE - 3), p.dtype)], axis=-1
        )
        cidf = cids.astype(jnp.float32)
        colf = colors.astype(jnp.float32)
        key = jnp.where(
            cidf >= 0.0,
            colf.astype(jnp.int32) * (1 << 24) + cidf.astype(jnp.int32),
            jnp.int32(2**30),
        )
        order = jnp.argsort(key, axis=-1, stable=True).astype(jnp.int32)
        take = lambda x: jnp.take_along_axis(x, order, axis=-1)
        cid_s = take(cidf)
        col_s = take(colf)
        pos_s = jnp.take_along_axis(pad, order[..., None], axis=1)
        pos_t_s = transposed_tiles(pos_s, Np)
        counts = jnp.sum(
            (colf[..., None] == jnp.arange(27, dtype=colf.dtype))
            & (cidf >= 0.0)[..., None],
            axis=1,
        ).astype(jnp.int32)
        starts_x = jnp.cumsum(counts, axis=-1) - counts
        sel_sorted = cid_s > -1.0  # dummy "kernel" output
        def unsort(o, s):
            return jnp.zeros((Np,), bool).at[o].set(s)
        sel = jax.vmap(unsort)(order, sel_sorted)
        return p * 0 + (
            sel.sum().astype(jnp.float32)
            + pos_t_s.sum()
            + col_s.sum()
            + starts_x.sum().astype(jnp.float32)
        )

    ms = chain_diff(prep_only, pts) * 1e3
    print(f"v3 prep-only (sort+gathers+counts+unsort): {ms:.3f} ms", flush=True)
    if args.quick:
        return

    from mccnn_tpu.api import build_hierarchy
    from mccnn_tpu.api.hierarchy import default_level_caps

    radii = (0.1, 0.4)
    caps = default_level_caps(N, radii)
    for variant in ("v1", "v3"):
        os.environ["MCCNN_POISSON_SWEEP"] = variant

        def hier(p):
            h = build_hierarchy(p, mask, radii, caps)
            return p * 0 + sum(
                lv.mask.sum().astype(jnp.float32) for lv in h.levels
            )

        ms = chain_diff(hier, pts) * 1e3
        print(f"{variant}: build_hierarchy {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
