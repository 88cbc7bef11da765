"""Composed data x spatial parallelism on a 2-D ``('data', 'spatial')`` mesh.

The spatial path trains whole scenes with their points slabbed over a mesh
axis and halo exchange over ICI (parallel/sharded_mcseg.py — the real flax
``MCSeg``, since round 4). This module composes that with data parallelism
(SURVEY §2.3 / §5.7-5.8): several independent scenes ride the 'data' axis
concurrently, each still spatially sharded over the 'spatial' axis.
Parameters enter ``shard_map`` replicated (spec ``P()``), so the transpose
rule all-reduces their gradients over BOTH mesh axes, and BN moments are
``psum``'d over both axes inside the forward — the same statistics the
block path computes over a whole batch. The 1-D path is the
``data_shards=1`` special case; ``tasks/scannet.py --spatial-shards S
--data-shards D`` wires this into training and ``__graft_entry__.
dryrun_multichip`` dry-runs the composed step on the virtual CPU mesh.

Array layout: everything batch-like is ``(D, S, cap, ...)`` — leading axes
sharded ``P('data', 'spatial')``, exactly one (scene, slab) block per device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..train.state import TrainState
from .sharded_mcseg import SpatialMCSegConfig, sharded_mcseg_apply_flax

AXIS_DATA, AXIS_SPATIAL = "data", "spatial"


def dp_spatial_mesh(data_shards: int, spatial_shards: int) -> Mesh:
    """('data', 'spatial') mesh over the first D*S visible devices."""
    import numpy as np

    need = data_shards * spatial_shards
    devs = jax.devices()
    if len(devs) < need:
        raise ValueError(
            f"data_shards x spatial_shards = {need} devices needed, "
            f"have {len(devs)}"
        )
    return Mesh(
        np.asarray(devs[:need]).reshape(data_shards, spatial_shards),
        (AXIS_DATA, AXIS_SPATIAL),
    )


def _make_apply(mesh: Mesh, cfg: SpatialMCSegConfig, halo_cap, backend, train):
    """shard_map'd forward over a (D, S, cap, ...) scene group."""
    n_sh = mesh.shape[AXIS_SPATIAL]
    sh = P(AXIS_DATA, AXIS_SPATIAL)
    L = len(cfg.radii)

    def apply(params, batch_stats, drop_rng, sp, sm, sf, masks):
        p_spec = jax.tree.map(lambda _: P(), params)
        s_spec = jax.tree.map(lambda _: P(), batch_stats)

        def fn(params, stats, rng, p_, m_, f_, *mk_):
            lm = [m[0, 0] for m in mk_] if mk_ else None
            # distinct dropout stream per (scene, slab) block
            rng = jax.random.fold_in(
                rng,
                jax.lax.axis_index(AXIS_DATA) * n_sh
                + jax.lax.axis_index(AXIS_SPATIAL),
            )
            logits, lms, ovf, new_stats = sharded_mcseg_apply_flax(
                {"params": params, "batch_stats": stats}, cfg,
                p_[0, 0], m_[0, 0], f_[0, 0],
                halo_cap=halo_cap, axis_name=AXIS_SPATIAL, n_shards=n_sh,
                stat_axes=(AXIS_DATA, AXIS_SPATIAL), train=train,
                dropout_rng=rng, level_masks=lm, backend=backend,
            )
            return (
                logits[None, None],
                ovf[None, None],
                tuple(m[None, None] for m in lms),
                new_stats,  # psum'd over both axes -> identical on every shard
            )

        n_masks = 0 if masks is None else len(masks)
        return shard_map(
            fn, mesh=mesh,
            in_specs=(p_spec, s_spec, P(), sh, sh, sh) + (sh,) * n_masks,
            out_specs=(sh, sh, (sh,) * (L + 1), s_spec),
            check_vma=False,
        )(params, batch_stats, drop_rng, sp, sm, sf, *(masks or ()))

    return apply


def make_dp_spatial_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    cfg: SpatialMCSegConfig,
    *,
    halo_cap: int,
    backend: str = "jnp",
    remat: bool = False,
):
    """Jitted train steps over ``(D, S, cap, ...)`` scene groups, training the
    flax ``MCSeg`` variables (``TrainState`` — same pytree the block-path
    Runner checkpoints).

    Returns ``(step_build, step_reuse)``:
    ``step_build(state, sp, sm, sf, sl)`` builds the sharded hierarchy this
    step and returns its level masks (cache them per scene group);
    ``step_reuse(state, sp, sm, sf, sl, *masks)`` consumes cached masks.
    Both return ``(state, loss, acc, halo_overflow, level_masks)``.
    Fully-masked padding scenes (``sm`` all False) are legal: they select
    nothing, contribute nothing to the loss, and leave gradients untouched.
    """
    apply_train = _make_apply(mesh, cfg, halo_cap, backend, train=True)
    # remat: recompute the sharded forward in the backward instead of storing
    # its activations (same trade as train/state.py make_train_step)
    apply = jax.checkpoint(apply_train) if remat else apply_train

    def loss_fn(params, batch_stats, drop_rng, sp, sm, sf, sl, masks):
        logits, ovf, lms, new_stats = apply(
            params, batch_stats, drop_rng, sp, sm, sf, masks
        )
        logp = jax.nn.log_softmax(logits)
        ll = jnp.take_along_axis(logp, sl[..., None], axis=-1)[..., 0]
        m = sm.astype(jnp.float32)
        loss = -(ll * m).sum() / jnp.maximum(m.sum(), 1.0)
        acc = ((logits.argmax(-1) == sl) & sm).sum() / jnp.maximum(m.sum(), 1.0)
        aux = (
            acc,
            ovf.sum(),
            jax.tree.map(jax.lax.stop_gradient, lms),
            jax.tree.map(jax.lax.stop_gradient, new_stats),
        )
        return loss, aux

    def make(with_masks):
        def step(state: TrainState, sp, sm, sf, sl, *masks):
            rng, drop_rng = jax.random.split(state.rng)
            (loss, (acc, ovf, lms, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(
                state.params, state.batch_stats, drop_rng, sp, sm, sf, sl,
                masks if with_masks else None,
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_state = TrainState(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                batch_stats=new_stats,
                opt_state=new_opt,
                rng=rng,
            )
            return new_state, loss, acc, ovf, lms

        return jax.jit(step)

    return make(False), make(True)


def make_dp_spatial_eval(
    mesh: Mesh,
    cfg: SpatialMCSegConfig,
    *,
    halo_cap: int,
    backend: str = "jnp",
):
    """Jitted eval forward over a ``(D, S, cap, ...)`` scene group: returns
    ``(logits, halo_overflow)``. BN uses the running stats (train=False) —
    the same eval semantics as the block path."""
    apply_eval = _make_apply(mesh, cfg, halo_cap, backend, train=False)

    def fwd(state: TrainState, sp, sm, sf):
        logits, ovf, _, _ = apply_eval(
            state.params, state.batch_stats, jax.random.PRNGKey(0),
            sp, sm, sf, None,
        )
        return logits, ovf.sum()

    return jax.jit(fwd)


def group_scenes(sharded: list, data_shards: int):
    """Stack per-scene ``(S, cap, ...)`` tuples into ``(D, S, cap, ...)``
    groups of ``data_shards`` scenes. A final short group is padded with
    fully-masked copies of its first scene (zero loss/grad contribution)."""
    import numpy as np

    groups = []
    for g in range(0, len(sharded), data_shards):
        chunk = list(sharded[g : g + data_shards])
        n_pad = data_shards - len(chunk)
        if n_pad:
            sp, sm, sf, sl = chunk[0]
            dead = (sp, np.zeros_like(sm), sf, sl)
            chunk = chunk + [dead] * n_pad
        groups.append(tuple(np.stack(x) for x in zip(*chunk)))
    return groups
