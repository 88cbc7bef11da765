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


def test_sharded_multilevel_mcseg_exact(rng):
    """Full multi-level U-Net under spatial sharding (VERDICT r1 #4): given
    the level masks the sharded hierarchy produced, the sharded network's
    logits are EXACTLY those of the single-device oracle."""
    from mccnn_tpu.parallel.sharded_hierarchy import (
        init_sharded_mcseg,
        sharded_mcseg_apply,
        unsharded_mcseg_apply,
    )

    radii = (0.04, 0.1)
    pts, mask = make_scene(rng, n=4096)
    feats = rng.normal(size=(len(pts), 8)).astype(np.float32)
    params = init_sharded_mcseg(jax.random.PRNGKey(1), 8, (16, 32), 5)

    cap = 1024
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)
    sf = np.zeros((N_SHARDS, cap, 8), np.float32)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        sf[s, valid] = feats[sidx[s][valid]]

    def fn(p, m, f):
        logits, masks, ovf = sharded_mcseg_apply(
            params, p[0], m[0], f[0], radii=radii, halo_cap=512,
            axis_name="x", n_shards=N_SHARDS, neighbor_k=16,
        )
        return logits[None], [mk[None] for mk in masks], ovf[None]

    with mesh8():
        logits_sh, masks_sh, ovf = shard_map(
            fn, mesh=mesh8(), in_specs=(P("x"), P("x"), P("x")),
            out_specs=(P("x"), [P("x")] * (len(radii) + 1), P("x")),
            check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(sf))
    assert int(np.asarray(ovf).sum()) == 0
    logits_sh = np.asarray(logits_sh)
    masks_sh = [np.asarray(mk) for mk in masks_sh]

    # scatter shard results back to global point order
    glogits = np.zeros((len(pts), 5), np.float32)
    gmasks = [np.zeros(len(pts), bool) for _ in masks_sh]
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        glogits[sidx[s][valid]] = logits_sh[s][valid]
        for i, mk in enumerate(masks_sh):
            gmasks[i][sidx[s][valid]] = mk[s][valid]

    # hierarchy sanity: levels nest and shrink
    assert gmasks[0].all()
    assert 0 < gmasks[2].sum() < gmasks[1].sum() < gmasks[0].sum()
    assert not (gmasks[1] & ~gmasks[0]).any()
    assert not (gmasks[2] & ~gmasks[1]).any()

    ref = np.asarray(
        unsharded_mcseg_apply(
            params, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(feats),
            [jnp.asarray(mk) for mk in gmasks], radii=radii, neighbor_k=16,
        )
    )
    np.testing.assert_allclose(glogits, ref, rtol=2e-3, atol=2e-4)


def test_sharded_mcseg_dense_backend_exact(rng):
    """backend="dense" (per-shard fused dense Pallas conv, VERDICT r2 #5):
    sharded logits == single-device oracle run with the same backend."""
    from mccnn_tpu.parallel.sharded_hierarchy import (
        init_sharded_mcseg,
        sharded_mcseg_apply,
        unsharded_mcseg_apply,
    )

    radii = (0.06, 0.12)
    pts, mask = make_scene(rng, n=1024)
    feats = rng.normal(size=(len(pts), 8)).astype(np.float32)
    params = init_sharded_mcseg(jax.random.PRNGKey(3), 8, (16, 16), 4)

    cap = 512
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)
    sf = np.zeros((N_SHARDS, cap, 8), np.float32)
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        sf[s, valid] = feats[sidx[s][valid]]

    def fn(p, m, f):
        logits, masks, ovf = sharded_mcseg_apply(
            params, p[0], m[0], f[0], radii=radii, halo_cap=512,
            axis_name="x", n_shards=N_SHARDS, neighbor_k=16, backend="dense",
        )
        return logits[None], [mk[None] for mk in masks], ovf[None]

    with mesh8():
        logits_sh, masks_sh, ovf = shard_map(
            fn, mesh=mesh8(), in_specs=(P("x"), P("x"), P("x")),
            out_specs=(P("x"), [P("x")] * (len(radii) + 1), P("x")),
            check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(sf))
    assert int(np.asarray(ovf).sum()) == 0
    logits_sh = np.asarray(logits_sh)
    masks_sh = [np.asarray(mk) for mk in masks_sh]

    glogits = np.zeros((len(pts), 4), np.float32)
    gmasks = [np.zeros(len(pts), bool) for _ in masks_sh]
    for s in range(N_SHARDS):
        valid = sidx[s] >= 0
        glogits[sidx[s][valid]] = logits_sh[s][valid]
        for i, mk in enumerate(masks_sh):
            gmasks[i][sidx[s][valid]] = mk[s][valid]

    ref = np.asarray(
        unsharded_mcseg_apply(
            params, jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(feats),
            [jnp.asarray(mk) for mk in gmasks], radii=radii, neighbor_k=16,
            backend="dense",
        )
    )
    np.testing.assert_allclose(glogits, ref, rtol=2e-3, atol=3e-4)


def _dp_sp_scene(rng, n, n_sh, cap, n_classes):
    pts, mask = make_scene(rng, n=n)
    lab = rng.integers(0, n_classes, size=n).astype(np.int32)
    sp, sm, sidx = shard_points_by_slab(pts, mask, n_sh, cap)
    sf = np.ones((n_sh, cap, 1), np.float32)
    sl = np.zeros((n_sh, cap), np.int32)
    for s in range(n_sh):
        valid = sidx[s] >= 0
        sl[s, valid] = lab[sidx[s][valid]]
    return sp, sm, sf, sl


def test_dp_spatial_composed(rng):
    """Composed data x spatial parallelism (2 x 4 mesh): the 2-scene step's
    loss equals the valid-point-weighted mean of the two 1-scene (1 x 4)
    losses at the same params; masks cache round-trips; grads flow (params
    change, stay finite); fully-masked pad scenes contribute nothing."""
    import optax

    from mccnn_tpu.parallel.dp_spatial import (
        dp_spatial_mesh,
        group_scenes,
        make_dp_spatial_step,
    )
    from mccnn_tpu.parallel.sharded_hierarchy import init_sharded_mcseg

    radii, halo_cap, n_classes, cap = (0.06, 0.12), 384, 4, 384
    scenes = [_dp_sp_scene(rng, 768, 4, cap, n_classes) for _ in range(2)]
    params = init_sharded_mcseg(jax.random.PRNGKey(7), 1, (8, 8), n_classes)
    tx = optax.adam(1e-3)
    opt0 = tx.init(params)

    def run(d_sh, group):
        mesh = dp_spatial_mesh(d_sh, 4)
        step_build, step_reuse = make_dp_spatial_step(
            mesh, tx, radii=radii, halo_cap=halo_cap, neighbor_k=16
        )
        batch = tuple(jnp.asarray(x) for x in group)
        with mesh:
            out = step_build(params, opt0, *batch)
            # reuse path at the SAME params/masks must reproduce the loss
            loss2 = step_reuse(params, opt0, *batch, *out[5])[2]
        return out, float(loss2)

    (g2,) = group_scenes(scenes, 2)
    out, loss_reuse = run(2, g2)
    new_params, _, loss, acc, ovf, lms = out
    assert int(ovf) == 0
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0
    np.testing.assert_allclose(float(loss), loss_reuse, rtol=1e-6)
    # grads flowed through both mesh axes: every param leaf moved, finite
    moved = jax.tree.map(
        lambda a, b: np.isfinite(np.asarray(b)).all()
        and not np.array_equal(np.asarray(a), np.asarray(b)),
        params, new_params,
    )
    assert all(jax.tree.leaves(moved))

    # per-scene 1 x 4 losses at the same initial params
    la = run(1, group_scenes(scenes[:1], 1)[0])[0][2]
    lb = run(1, group_scenes(scenes[1:], 1)[0])[0][2]
    ca, cb = scenes[0][1].sum(), scenes[1][1].sum()
    want = (float(la) * ca + float(lb) * cb) / (ca + cb)
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)

    # padded group (3 scenes, D=2): group 2 = [scene0, dead pad] -> loss == la
    g_pad = group_scenes(scenes + scenes[:1], 2)[1]  # [scene0, dead(scene0)]
    assert not g_pad[1][1].any()  # pad scene fully masked
    out_pad, _ = run(2, g_pad)
    np.testing.assert_allclose(float(out_pad[2]), float(la), rtol=1e-5)

    # remat=True must change memory, not math: same loss + updated params
    mesh = dp_spatial_mesh(2, 4)
    step_rm, _ = make_dp_spatial_step(
        mesh, tx, radii=radii, halo_cap=halo_cap, neighbor_k=16, remat=True
    )
    with mesh:
        out_rm = step_rm(params, opt0, *tuple(jnp.asarray(x) for x in g2))
    np.testing.assert_allclose(float(out_rm[2]), float(loss), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        new_params, out_rm[0],
    )
