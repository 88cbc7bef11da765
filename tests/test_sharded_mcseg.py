"""Spatially-sharded flax MCSeg (parallel/sharded_mcseg.py) vs the zoo model.

VERDICT r3 #1: ``--spatial-shards`` must train the REAL ``models/mcseg.py``
network — same parameter tree (checkpoint interop), same masked-BN semantics,
same dropout site. The core assertion here: given identical flax variables
and level masks, the sharded forward's gathered logits equal
``MCSeg.apply``'s, including the updated batch_stats.

The geometry deliberately includes a conv radius LARGER than one slab
(0.2 > 1/8) so the all-gather source path is exercised alongside the halo
path — the round-4 soundness fix (see parallel/sharded_mcseg.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from mccnn_tpu.api.hierarchy import hierarchy_from_masks
from mccnn_tpu.models import MCSeg
from mccnn_tpu.parallel.dp_spatial import (
    dp_spatial_mesh,
    group_scenes,
    make_dp_spatial_eval,
    make_dp_spatial_step,
)
from mccnn_tpu.parallel.sharded_mcseg import (
    SpatialMCSegConfig,
    sharded_mcseg_apply_flax,
)
from mccnn_tpu.parallel.spatial import shard_points_by_slab
from mccnn_tpu.train.state import TrainState

N_SHARDS = 8
RADII = (0.04, 0.1)  # conv radii 0.08 (halo path) and 0.2 (gather path)


def mesh8():
    return Mesh(np.asarray(jax.devices()[:N_SHARDS]), ("x",))


def _scene(rng, n):
    pts = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return pts, np.ones(n, bool)


def _init_variables(cfg, seed=0):
    model = cfg.model()
    pts = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (1, 128, 3)),
                      jnp.float32)
    return model, model.init(
        jax.random.PRNGKey(seed), pts, jnp.ones((1, 128), bool),
        jnp.ones((1, 128, 1), jnp.float32), train=False,
    )


def _run_sharded(variables, cfg, pts, mask, halo_cap=512, train=True,
                 cap=512, dropout_rng=None, radii=RADII):
    sp, sm, sidx = shard_points_by_slab(pts, mask, N_SHARDS, cap)
    sf = np.ones((N_SHARDS, cap, 1), np.float32)

    def fn(p_, m_, f_):
        logits, masks, ovf, new_stats = sharded_mcseg_apply_flax(
            variables, cfg, p_[0], m_[0], f_[0], halo_cap=halo_cap,
            axis_name="x", n_shards=N_SHARDS, train=train,
            dropout_rng=dropout_rng,
        )
        return (
            logits[None], [mk[None] for mk in masks], ovf[None], new_stats
        )

    s_spec = jax.tree.map(lambda _: P(), variables.get("batch_stats", {}))
    with mesh8():
        logits, masks, ovf, new_stats = shard_map(
            fn, mesh=mesh8(), in_specs=(P("x"), P("x"), P("x")),
            out_specs=(P("x"), [P("x")] * (len(radii) + 1), P("x"), s_spec),
            check_vma=False,
        )(jnp.asarray(sp), jnp.asarray(sm), jnp.asarray(sf))
    assert int(np.asarray(ovf).sum()) == 0
    # scatter back to global order
    logits = np.asarray(logits)
    masks = [np.asarray(mk) for mk in masks]
    gl = np.zeros((len(pts), logits.shape[-1]), np.float32)
    gmasks = [np.zeros(len(pts), bool) for _ in masks]
    for s in range(N_SHARDS):
        v = sidx[s] >= 0
        gl[sidx[s][v]] = logits[s][v]
        for i, mk in enumerate(masks):
            gmasks[i][sidx[s][v]] = mk[s][v]
    return gl, gmasks, new_stats


def test_sharded_flax_mcseg_matches_mcseg_apply(rng):
    """Sharded forward == MCSeg.apply given the same variables + level masks,
    in BOTH train mode (batch-stats update, mesh-psum'd moments) and eval
    mode (running stats)."""
    cfg = SpatialMCSegConfig(
        n_classes=5, grow=8, radii=RADII, neighbor_k=32, drop_rate=0.0
    )
    model, variables = _init_variables(cfg)
    pts, mask = _scene(rng, 2048)

    gl, gmasks, new_stats = _run_sharded(variables, cfg, pts, mask, train=True)
    assert gmasks[0].all()
    assert 0 < gmasks[2].sum() < gmasks[1].sum() < gmasks[0].sum()

    hier = hierarchy_from_masks(
        jnp.asarray(pts)[None], [jnp.asarray(m)[None] for m in gmasks], RADII
    )
    ref, mut = model.apply(
        variables, jnp.asarray(pts)[None], jnp.asarray(mask)[None],
        train=True, hierarchy=hier, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(gl, np.asarray(ref[0]), rtol=2e-3, atol=2e-4)
    # batch_stats must match too (same moments -> same running averages)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        new_stats, dict(mut["batch_stats"]),
    )

    # eval mode: running stats, no moment psums
    gl_e, _, _ = _run_sharded(variables, cfg, pts, mask, train=False)
    ref_e = model.apply(
        variables, jnp.asarray(pts)[None], jnp.asarray(mask)[None],
        train=False, hierarchy=hier,
    )
    np.testing.assert_allclose(gl_e, np.asarray(ref_e[0]), rtol=2e-3, atol=2e-4)


def test_sharded_flax_matches_mcseg_apply_second_geometry(rng):
    """Body-drift guard at a SECOND geometry (VERDICT r4 #7): three radii
    (mixing halo- and gather-path conv sites), non-power-of-two scene size,
    odd shard/halo caps. The hand-written mirror must still equal
    ``MCSeg.apply`` exactly."""
    radii3 = (0.05, 0.09, 0.2)  # conv radii 0.1 (halo), 0.18/0.4 (gather)
    cfg = SpatialMCSegConfig(
        n_classes=3, grow=8, radii=radii3, neighbor_k=24, drop_rate=0.0
    )
    model, variables = _init_variables(cfg, seed=11)
    pts, mask = _scene(rng, 1800)
    gl, gmasks, new_stats = _run_sharded(
        variables, cfg, pts, mask, cap=728, halo_cap=344, train=True,
        radii=radii3,
    )
    assert gmasks[0].all() and 0 < gmasks[3].sum() < gmasks[1].sum()
    hier = hierarchy_from_masks(
        jnp.asarray(pts)[None], [jnp.asarray(m)[None] for m in gmasks], radii3
    )
    ref, mut = model.apply(
        variables, jnp.asarray(pts)[None], jnp.asarray(mask)[None],
        train=True, hierarchy=hier, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(gl, np.asarray(ref[0]), rtol=2e-3, atol=2e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        new_stats, dict(mut["batch_stats"]),
    )


def test_sharded_dropout_statistics():
    """The mirror's dropout (VERDICT r4 #6-weak): drop fraction ~= rate,
    survivors scaled by 1/keep, masks independent across shards AND across
    dropout sites. Observed by comparing against a dropout-free run of the
    same BN site: zeros where the clean output was positive are drops."""
    from mccnn_tpu.parallel.sharded_mcseg import _Mirror

    C, NP, rate = 64, 1024, 0.4
    cfg = SpatialMCSegConfig(n_classes=2, grow=8, drop_rate=rate)
    variables = {
        "params": {"bn": {"MaskedBatchNorm_0": {
            "scale": jnp.ones((C,)), "bias": jnp.zeros((C,))}}},
        "batch_stats": {"bn": {"MaskedBatchNorm_0": {
            "mean": jnp.zeros((C,)), "var": jnp.ones((C,))}}},
    }
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(N_SHARDS, NP, C)), jnp.float32
    )
    mask = jnp.ones((N_SHARDS, NP), bool)
    base_rng = jax.random.PRNGKey(9)

    def fn(x_, m_):
        def mirror(drop_rng):
            return _Mirror(
                variables, cfg, points=jnp.zeros((NP, 3)), halo_cap=8,
                axis_name="x", n_shards=N_SHARDS, stat_axes=("x",),
                train=True, dropout_rng=drop_rng, backend="jnp",
            )

        clean = mirror(None).bn_relu_drop("bn", x_[0], m_[0], rate)
        mir = mirror(base_rng)
        y1 = mir.bn_relu_drop("bn", x_[0], m_[0], rate)  # site 0
        y2 = mir.bn_relu_drop("bn", x_[0], m_[0], rate)  # site 1
        return clean[None], y1[None], y2[None]

    with mesh8():
        clean, y1, y2 = shard_map(
            fn, mesh=mesh8(), in_specs=(P("x"), P("x")),
            out_specs=(P("x"), P("x"), P("x")), check_vma=False,
        )(x, mask)
    clean, y1, y2 = map(np.asarray, (clean, y1, y2))
    pos = clean > 0  # relu survivors — the only observable dropout support
    assert pos.mean() > 0.3
    keep = 1.0 - rate
    for y in (y1, y2):
        dropped = pos & (y == 0.0)
        kept = pos & (y != 0.0)
        # fraction ~= rate (binomial, ~260k positive elements per run)
        np.testing.assert_allclose(dropped.sum() / pos.sum(), rate, atol=0.01)
        # survivors scaled by exactly 1/keep
        np.testing.assert_allclose(y[kept], clean[kept] / keep, rtol=1e-6)
    m1, m2 = pos & (y1 == 0.0), pos & (y2 == 0.0)
    # per-site streams differ
    assert (m1 != m2).mean() > 0.2
    # cross-shard independence: no two shards share a drop pattern
    for s in range(1, N_SHARDS):
        assert (m1[0, : NP // 2] != m1[s, : NP // 2]).mean() > 0.2


def test_bn_schedule_counts_update(rng):
    """The TF1 decaying-momentum schedule's step counter lives in batch_stats
    and must advance under the sharded trainer exactly as under the flax one."""
    cfg = SpatialMCSegConfig(
        n_classes=4, grow=8, radii=RADII, neighbor_k=16, drop_rate=0.0,
        bn_schedule_steps=100,
    )
    _, variables = _init_variables(cfg)
    pts, mask = _scene(rng, 1024)
    _, _, new_stats = _run_sharded(variables, cfg, pts, mask, train=True)
    counts = [
        np.asarray(v)
        for path, v in jax.tree_util.tree_flatten_with_path(new_stats)[0]
        if "count" in str(path[-1])
    ]
    assert counts and all(c == 1.0 for c in counts)


def _dp_scene(rng, n, s_sh, cap, n_classes):
    pts, mask = _scene(rng, n)
    lab = rng.integers(0, n_classes, size=n).astype(np.int32)
    sp, sm, sidx = shard_points_by_slab(pts, mask, s_sh, cap)
    sf = np.ones((s_sh, cap, 1), np.float32)
    sl = np.zeros((s_sh, cap), np.int32)
    for s in range(s_sh):
        v = sidx[s] >= 0
        sl[s, v] = lab[sidx[s][v]]
    return sp, sm, sf, sl


def test_dp_spatial_composed(rng):
    """Composed data x spatial training of the flax MCSeg on a 2x4 mesh:
    grads flow into every param leaf, batch_stats update, the mask-reuse path
    reproduces the loss, a fully-masked pad scene leaves the composed result
    equal to the single-scene run (masked BN psums ignore dead scenes), and
    remat changes memory, not math."""
    cfg = SpatialMCSegConfig(
        n_classes=4, grow=8, radii=(0.06, 0.12), neighbor_k=16, drop_rate=0.0
    )
    _, variables = _init_variables(cfg, seed=3)
    tx = optax.adam(1e-3)
    cap = 384
    scenes = [_dp_scene(rng, 768, 4, cap, 4) for _ in range(2)]

    def fresh_state():
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]), rng=jax.random.PRNGKey(5),
        )

    def run(d_sh, group, remat=False):
        mesh = dp_spatial_mesh(d_sh, 4)
        step_build, step_reuse = make_dp_spatial_step(
            mesh, tx, cfg, halo_cap=cap, remat=remat
        )
        batch = tuple(jnp.asarray(x) for x in group)
        with mesh:
            out = step_build(fresh_state(), *batch)
            loss2 = step_reuse(fresh_state(), *batch, *out[4])[1]
        return out, float(loss2)

    (g2,) = group_scenes(scenes, 2)
    out, loss_reuse = run(2, g2)
    new_state, loss, acc, ovf, lms = out
    assert int(ovf) == 0
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0
    np.testing.assert_allclose(float(loss), loss_reuse, rtol=1e-6)
    # grads flowed through both mesh axes: every param leaf moved, finite
    moved = jax.tree.map(
        lambda a, b: np.isfinite(np.asarray(b)).all()
        and not np.array_equal(np.asarray(a), np.asarray(b)),
        variables["params"], new_state.params,
    )
    assert all(jax.tree.leaves(moved))
    # batch_stats moved as well (train-mode BN)
    stats_moved = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: not np.array_equal(np.asarray(a), np.asarray(b)),
            dict(variables["batch_stats"]), new_state.batch_stats,
        )
    )
    assert any(stats_moved)

    # padded group [scene0, dead]: masked BN + point-weighted loss ignore the
    # dead scene entirely -> must equal the 1x4 run of scene0 alone
    la = run(1, group_scenes(scenes[:1], 1)[0])[0][1]
    g_pad = group_scenes(scenes + scenes[:1], 2)[1]  # [scene0, dead(scene0)]
    assert not g_pad[1][1].any()  # pad scene fully masked
    out_pad, _ = run(2, g_pad)
    np.testing.assert_allclose(float(out_pad[1]), float(la), rtol=1e-5)

    # remat=True must change memory, not math: same loss + updated params
    out_rm, _ = run(2, g2, remat=True)
    np.testing.assert_allclose(float(out_rm[1]), float(loss), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
        ),
        new_state.params, out_rm[0].params,
    )


def test_spatial_checkpoint_interop(rng):
    """A state trained by the spatial path is directly consumable by the flax
    MCSeg block path (same pytree), and the spatial eval path consumes it
    with running-stat BN."""
    cfg = SpatialMCSegConfig(
        n_classes=4, grow=8, radii=(0.06, 0.12), neighbor_k=16
    )
    model, variables = _init_variables(cfg, seed=1)
    tx = optax.adam(1e-3)
    cap = 384
    scene = _dp_scene(rng, 768, 4, cap, 4)
    mesh = dp_spatial_mesh(1, 4)
    step_build, _ = make_dp_spatial_step(mesh, tx, cfg, halo_cap=cap)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]), rng=jax.random.PRNGKey(2),
    )
    batch = tuple(jnp.asarray(x) for x in group_scenes([scene], 1)[0])
    with mesh:
        state, loss, *_ = step_build(state, *batch)
        eval_fn = make_dp_spatial_eval(mesh, cfg, halo_cap=cap)
        logits_sp, ovf = eval_fn(state, *batch[:3])
    assert int(ovf) == 0
    assert np.isfinite(np.asarray(logits_sp)).all()

    # block-path consumption of the spatially-trained state: same param tree
    pts = rng.uniform(0, 1, size=(2, 256, 3)).astype(np.float32)
    out = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        jnp.asarray(pts), jnp.ones((2, 256), bool), train=False,
    )
    assert out.shape == (2, 256, 4)
    assert np.isfinite(np.asarray(out)).all()
