"""Composed data x spatial parallelism on a 2-D ``('data', 'spatial')`` mesh.

The 1-D spatial path (parallel/sharded_hierarchy.py) trains ONE huge scene at
a time, its points slabbed over a mesh axis with halo exchange over ICI. This
module composes that with data parallelism (SURVEY §2.3 / §5.7-5.8): several
independent scenes ride the 'data' axis concurrently, each still spatially
sharded over the 'spatial' axis. Parameters enter ``shard_map`` replicated
(spec ``P()``), so the transpose rule all-reduces their gradients over BOTH
mesh axes — no hand-written collectives. The 1-D path is the
``data_shards=1`` special case; ``tasks/scannet.py --spatial-shards S
--data-shards D`` wires this into training and ``__graft_entry__.
dryrun_multichip`` dry-runs the composed step on the virtual CPU mesh.

Array layout: everything batch-like is ``(D, S, cap, ...)`` — leading axes
sharded ``P('data', 'spatial')``, exactly one (scene, slab) block per device.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .sharded_hierarchy import sharded_mcseg_apply

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


def make_dp_spatial_step(
    mesh: Mesh,
    tx: optax.GradientTransformation,
    *,
    radii: Sequence[float],
    halo_cap: int,
    neighbor_k: int = 16,
    backend: str = "jnp",
    remat: bool = False,
):
    """Jitted train steps over ``(D, S, cap, ...)`` scene groups.

    Returns ``(step_build, step_reuse)``:
    ``step_build(params, opt, sp, sm, sf, sl)`` builds the sharded hierarchy
    this step and returns its level masks (cache them per scene group);
    ``step_reuse(params, opt, sp, sm, sf, sl, *masks)`` consumes cached masks.
    Both return ``(params, opt, loss, acc, halo_overflow, level_masks)``.
    Fully-masked padding scenes (``sm`` all False) are legal: they select
    nothing, contribute nothing to the loss, and leave gradients untouched.
    """
    n_sh = mesh.shape[AXIS_SPATIAL]
    sh = P(AXIS_DATA, AXIS_SPATIAL)

    def apply_sharded(params, sp, sm, sf, masks):
        p_spec = jax.tree.map(lambda _: P(), params)

        def fn(params, p_, m_, f_, *mk_):
            lm = [m[0, 0] for m in mk_] if mk_ else None
            logits, lms, ovf = sharded_mcseg_apply(
                params, p_[0, 0], m_[0, 0], f_[0, 0], radii=radii,
                halo_cap=halo_cap, axis_name=AXIS_SPATIAL, n_shards=n_sh,
                neighbor_k=neighbor_k, level_masks=lm, backend=backend,
            )
            return (
                logits[None, None],
                ovf[None, None],
                tuple(m[None, None] for m in lms),
            )

        n_masks = 0 if masks is None else len(masks)
        return shard_map(
            fn, mesh=mesh,
            in_specs=(p_spec, sh, sh, sh) + (sh,) * n_masks,
            out_specs=(sh, sh, (sh,) * (len(radii) + 1)),
            check_vma=False,
        )(params, sp, sm, sf, *(masks or ()))

    # remat: recompute the sharded forward in the backward instead of storing
    # its activations (same trade as train/state.py make_train_step)
    apply = jax.checkpoint(apply_sharded) if remat else apply_sharded

    def loss_fn(params, sp, sm, sf, sl, masks):
        logits, ovf, lms = apply(params, sp, sm, sf, masks)
        logp = jax.nn.log_softmax(logits)
        ll = jnp.take_along_axis(logp, sl[..., None], axis=-1)[..., 0]
        m = sm.astype(jnp.float32)
        loss = -(ll * m).sum() / jnp.maximum(m.sum(), 1.0)
        acc = ((logits.argmax(-1) == sl) & sm).sum() / jnp.maximum(m.sum(), 1.0)
        return loss, (acc, ovf.sum(), jax.tree.map(jax.lax.stop_gradient, lms))

    def make(with_masks):
        def step(params, opt_state, sp, sm, sf, sl, *masks):
            (loss, (acc, ovf, lms)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, sp, sm, sf, sl, masks if with_masks else None)
            updates, opt_state = tx.update(grads, opt_state)
            return (
                optax.apply_updates(params, updates), opt_state, loss, acc,
                ovf, lms,
            )

        return jax.jit(step)

    return make(False), make(True)


def make_dp_spatial_eval(
    mesh: Mesh,
    *,
    radii: Sequence[float],
    halo_cap: int,
    neighbor_k: int = 16,
    backend: str = "jnp",
):
    """Jitted forward over a ``(D, S, cap, ...)`` scene group: returns
    ``(logits, halo_overflow)`` for metric computation (no grads, hierarchy
    built in-call). Same layout contract as ``make_dp_spatial_step``."""
    n_sh = mesh.shape[AXIS_SPATIAL]
    sh = P(AXIS_DATA, AXIS_SPATIAL)

    def apply_fn(params, sp, sm, sf):
        p_spec = jax.tree.map(lambda _: P(), params)

        def fn(params, p_, m_, f_):
            logits, _, ovf = sharded_mcseg_apply(
                params, p_[0, 0], m_[0, 0], f_[0, 0], radii=radii,
                halo_cap=halo_cap, axis_name=AXIS_SPATIAL, n_shards=n_sh,
                neighbor_k=neighbor_k, backend=backend,
            )
            return logits[None, None], ovf[None, None]

        logits, ovf = shard_map(
            fn, mesh=mesh, in_specs=(p_spec, sh, sh, sh),
            out_specs=(sh, sh), check_vma=False,
        )(params, sp, sm, sf)
        return logits, ovf.sum()

    return jax.jit(apply_fn)


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
