"""Spatial sharding + halo exchange vs the single-device oracle, on the
8-virtual-device CPU mesh (SURVEY §4 'distributed tests without a cluster')."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mccnn_tpu.core import init_mcconv_params, kde_density, mc_conv, radius_neighbors
from mccnn_tpu.parallel.spatial import (
    exchange_halos,
    shard_points_by_slab,
    slab_bounds,
)

RADIUS = 0.08
K = 32
N_SHARDS = 8


def make_scene(rng, n=2048):
    pts = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return pts, np.ones(n, bool)


def mesh8():
    return Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("x",))


def test_halo_conv_matches_unsharded(rng):
    pts, mask = make_scene(rng)
    feats = rng.normal(size=(len(pts), 16)).astype(np.float32)
    params = init_mcconv_params(jax.random.PRNGKey(0), 16, None)

    # ---- unsharded oracle (batch dim of 1) ----
    jp, jm, jf = (jnp.asarray(x)[None] for x in (pts, mask, feats))
    pdf = kde_density(jp, jm, RADIUS, k=K)
    nbh = radius_neighbors(jp, jm, jp, jm, RADIUS, K)
    ref = np.asarray(mc_conv(params, jp, nbh, jp, jf, pdf))[0]

    # ---- sharded: slabs along x + halo exchange ----
    cap = 512
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)
    sf = np.zeros((N_SHARDS, cap, 16), np.float32)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        sf[s, valid] = feats[sidx[s][valid]]

    def shard_fn(p, m, f):
        p, m, f = p[0], m[0], f[0]
        lo, hi = slab_bounds(N_SHARDS, "x")
        # Two-phase exact pattern: (1) exchange position halos and compute the
        # pdf of LOCAL points on their owner shard (their r-balls are fully
        # covered by the halo); (2) exchange {features, pdf} halos and run the
        # conv — shipped pdf values are the owner-exact ones.
        aug1 = exchange_halos(p, m, {}, lo, hi, RADIUS, 256, "x")
        pdf_local = kde_density(
            aug1.points[None], aug1.mask[None], RADIUS, k=K
        )[0, : p.shape[0]]
        aug = exchange_halos(
            p, m, {"f": f, "pdf": pdf_local}, lo, hi, RADIUS, 256, "x"
        )
        # shipped-halo pdf padding is 0 -> guard (masked anyway)
        pdf_aug = jnp.maximum(aug.values["pdf"], 1e-12)
        nbh = radius_neighbors(
            p[None], m[None], aug.points[None], aug.mask[None], RADIUS, K
        )
        out = mc_conv(
            params,
            p[None],
            nbh,
            aug.points[None],
            aug.values["f"][None],
            pdf_aug[None],
        )
        return out

    with mesh8():
        out = shard_map(
            shard_fn,
            mesh=mesh8(),
            in_specs=(P("x"), P("x"), P("x")),
            out_specs=P("x"),
            check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(sf))
    out = np.asarray(out)  # (N_SHARDS, cap, 16)

    # compare per original point
    got = np.zeros_like(ref)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        got[sidx[s][valid]] = out[s][valid]
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=1e-5)


def test_halo_overflow_masks(rng):
    # tiny halo cap: results for interior points must still match; boundary
    # points may differ (documented truncation), but nothing crashes/NaNs.
    pts, mask = make_scene(rng, n=512)
    cap = 128
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)

    def shard_fn(p, m):
        p, m = p[0], m[0]
        lo, hi = slab_bounds(N_SHARDS, "x")
        aug = exchange_halos(p, m, {}, lo, hi, RADIUS, 4, "x")
        pdf = kde_density(aug.points[None], aug.mask[None], RADIUS, k=K)[0]
        return pdf[None, : p.shape[0]]

    with mesh8():
        out = shard_map(
            shard_fn,
            mesh=mesh8(),
            in_specs=(P("x"), P("x")),
            out_specs=P("x"),
            check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm))
    assert bool(jnp.isfinite(out).all())


def test_multihost_degenerate_single_process(rng):
    """Single-process degenerate case of the multi-host recipe: global mesh,
    host-local batch assembly, one sharded reduction."""
    import jax.numpy as jnp
    from mccnn_tpu.parallel.multihost import (
        global_data_mesh,
        host_local_batch_to_global,
        initialize_distributed,
        process_info,
    )

    initialize_distributed()  # no-op single process
    info = process_info()
    assert info["process_count"] == 1 and info["global_devices"] == 8
    mesh = global_data_mesh()
    batch = {"x": rng.normal(size=(16, 4)).astype(np.float32)}
    g = host_local_batch_to_global(batch, mesh)
    assert g["x"].shape == (16, 4)
    s = jax.jit(lambda b: b["x"].sum())(g)
    np.testing.assert_allclose(float(s), batch["x"].sum(), rtol=1e-5)


def test_sharded_seg_network_matches_unsharded(rng):
    """Multi-layer spatially-sharded segmentation network == unsharded oracle."""
    from mccnn_tpu.parallel.sharded_seg import (
        init_sharded_seg,
        sharded_seg_apply,
        unsharded_seg_apply,
    )

    pts, mask = make_scene(rng, n=2048)
    feats = rng.normal(size=(len(pts), 8)).astype(np.float32)
    params = init_sharded_seg(jax.random.PRNGKey(0), 8, 16, 5)

    ref = np.asarray(
        unsharded_seg_apply(
            params, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(feats),
            radius=RADIUS, neighbor_k=K,
        )
    )

    cap = 512
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)
    sf = np.zeros((N_SHARDS, cap, 8), np.float32)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        sf[s, valid] = feats[sidx[s][valid]]

    def fn(p, m, f):
        return sharded_seg_apply(
            params, p[0], m[0], f[0], radius=RADIUS, halo_cap=256,
            axis_name="x", n_shards=N_SHARDS, neighbor_k=K,
        )[None]

    with mesh8():
        out = shard_map(
            fn,
            mesh=mesh8(),
            in_specs=(P("x"), P("x"), P("x")),
            out_specs=P("x"),
            check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(sf))
    out = np.asarray(out)

    got = np.zeros_like(ref)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        got[sidx[s][valid]] = out[s][valid]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def test_sharded_poisson_invariants(rng):
    """Sharded Poisson-disk: exact min-distance globally, ~2r coverage near
    boundaries, r coverage in slab interiors."""
    from mccnn_tpu.parallel.sharded_sampling import sharded_poisson_disk
    from mccnn_tpu.parallel.spatial import slab_bounds

    radius = 0.03  # slab width 1/8 = 0.125 >= 2r, with real interior
    pts, mask = make_scene(rng, n=4096)
    cap = 1024
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)

    def fn(p, m):
        lo, hi = slab_bounds(N_SHARDS, "x")
        sel, overflow = sharded_poisson_disk(p[0], m[0], radius, lo, hi, 512, "x")
        return sel[None], overflow[None]

    with mesh8():
        sel, overflow = shard_map(
            fn, mesh=mesh8(), in_specs=(P("x"), P("x")),
            out_specs=(P("x"), P("x")),
            check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm))
    sel = np.asarray(sel)
    assert int(np.asarray(overflow).sum()) == 0  # halo cap adequate

    chosen = []
    for s in range(N_SHARDS):
        valid = (sidx[s] >= 0) & sel[s]
        chosen.append(pts[sidx[s][valid]])
    chosen = np.concatenate(chosen)
    assert len(chosen) > 50

    # global min-distance: EXACT
    d = np.linalg.norm(chosen[:, None] - chosen[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= radius - 1e-6, d.min()

    # coverage: everywhere within 2r; slab interiors within r
    dcov = np.linalg.norm(pts[:, None] - chosen[None, :], axis=-1).min(-1)
    assert dcov.max() <= 2 * radius + 1e-6, dcov.max()
    # dropped boundary selections can leave points within 2r of a slab edge
    # covered only at <= 2r; strictly interior points keep the exact r bound
    w = 1.0 / N_SHARDS
    frac = (pts[:, 0] % w) / w
    interior = (frac > 2 * radius / w) & (frac < 1 - 2 * radius / w)
    assert dcov[interior].max() <= radius + 1e-6


def test_halo_overflow_reported(rng):
    """exchange_halos reports dropped boundary points via .overflow."""
    from mccnn_tpu.parallel.spatial import exchange_halos, slab_bounds

    pts, mask = make_scene(rng, n=1024)
    cap = 256
    sp, sm, _ = shard_points_by_slab(pts, mask, N_SHARDS, cap)

    def fn(p, m, halo_cap):
        lo, hi = slab_bounds(N_SHARDS, "x")
        aug = exchange_halos(p[0], m[0], {}, lo, hi, 0.06, halo_cap, "x")
        return aug.overflow[None]

    with mesh8():
        ok = shard_map(
            lambda p, m: fn(p, m, 128), mesh=mesh8(),
            in_specs=(P("x"), P("x")), out_specs=P("x"), check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm))
        tiny = shard_map(
            lambda p, m: fn(p, m, 8), mesh=mesh8(),
            in_specs=(P("x"), P("x")), out_specs=P("x"), check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm))
    assert int(np.asarray(ok).sum()) == 0
    assert int(np.asarray(tiny).sum()) > 0


def test_gather_level_conv_exact_beyond_slab_width(rng):
    """Ops whose radius exceeds one slab width (0.3 > 1/8) must use the
    compacted all-gather source path (round-4 soundness fix): a single halo
    exchange only reaches the adjacent shard and silently loses in-radius
    sources two slabs away. The gathered conv must equal the unsharded one."""
    from mccnn_tpu.parallel.spatial import gather_level

    radius = 0.3
    pts, mask = make_scene(rng, n=1024)
    feats = rng.normal(size=(len(pts), 8)).astype(np.float32)
    params = init_mcconv_params(jax.random.PRNGKey(2), 8, None)

    jp, jm, jf = (jnp.asarray(x)[None] for x in (pts, mask, feats))
    pdf = jnp.ones((1, len(pts)), jnp.float32)
    nbh = radius_neighbors(jp, jm, jp, jm, radius, 64)
    ref = np.asarray(mc_conv(params, jp, nbh, jp, jf, pdf))[0]

    cap = 256
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)
    sf = np.zeros((N_SHARDS, cap, 8), np.float32)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        sf[s, valid] = feats[sidx[s][valid]]

    def fn(p, m, f):
        p, m, f = p[0], m[0], f[0]
        aug = gather_level(p, m, {"f": f}, cap, "x")
        nbh = radius_neighbors(
            p[None], m[None], aug.points[None], aug.mask[None], radius, 64
        )
        pdf1 = jnp.ones((1, aug.points.shape[0]), jnp.float32)
        out = mc_conv(params, p[None], nbh, aug.points[None],
                      aug.values["f"][None], pdf1)
        return out, aug.overflow[None]

    with mesh8():
        out, ovf = shard_map(
            fn, mesh=mesh8(), in_specs=(P("x"), P("x"), P("x")),
            out_specs=(P("x"), P("x")), check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(sf))
    assert int(np.asarray(ovf).sum()) == 0
    out = np.asarray(out)
    got = np.zeros_like(ref)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        got[sidx[s][valid]] = out[s][valid]
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)
