"""Train state + optimizer schedule + train-step factory.

Reference parity: the TF1 training plumbing in the task scripts — Adam with
exponential LR decay, a BN-decay schedule, periodic Saver checkpoints
(SURVEY §3.1).  Here: optax Adam + exponential_decay, flax train state with
batch_stats, and a jit-able step function with the batch axis sharded over a
device mesh (dp.py) so the gradient all-reduce rides ICI."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax import Array


class TrainState(NamedTuple):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Array


def make_optimizer(
    lr: float = 1e-3,
    decay_steps: int = 20_000,
    decay_rate: float = 0.7,
    weight_decay: float = 0.0,
    grad_clip: float | None = None,
) -> optax.GradientTransformation:
    """Adam + staircase exponential decay (the reference's schedule shape)."""
    schedule = optax.exponential_decay(
        lr, transition_steps=decay_steps, decay_rate=decay_rate, staircase=True
    )
    txs = []
    if grad_clip is not None:
        txs.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay > 0.0:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.adam(schedule))
    return optax.chain(*txs)


def _model_args(batch: dict) -> tuple:
    """(points, mask, features[, category_onehot]) positional contract shared
    by every model in the zoo (MCSeg additionally takes the category)."""
    args = [batch["points"], batch["mask"], batch.get("features")]
    if "category_onehot" in batch:
        args.append(batch["category_onehot"])
    return tuple(args)


def init_state(
    model,
    tx: optax.GradientTransformation,
    rng: Array,
    example_batch: dict,
) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(init_rng, *_model_args(example_batch), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=state_rng,
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable[..., tuple[Array, dict]],
    remat: bool = False,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Build a pure train step.

    ``loss_fn(apply_out, batch) -> (loss, metrics)`` where ``apply_out`` is the
    model output. The step handles BN mutation, dropout rngs, grads, and the
    optimizer update. jit/shard it at the call site (see parallel/dp.py and
    __graft_entry__.py).

    ``remat=True`` wraps the forward in ``jax.checkpoint``: the backward
    stores only the batch and parameters and recomputes activations, trading
    ~1 extra forward for peak-HBM ~ O(largest single op) instead of the sum
    over layers — the whole-scene single-chip path's memory unlock
    (SURVEY §7 'HBM bandwidth/rematerialisation')."""

    def step(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        rng, drop_rng = jax.random.split(state.rng)

        def apply_fn(params, batch, drop_rng):
            return model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                *_model_args(batch),
                train=True,
                mutable=["batch_stats", "diagnostics"],
                rngs={"dropout": drop_rng},
            )

        if remat:
            apply_fn = jax.checkpoint(apply_fn)

        def compute_loss(params):
            out, updates = apply_fn(params, batch, drop_rng)
            loss, metrics = loss_fn(out, batch)
            # Kernel-side health counters (e.g. tile-pair capacity overflow,
            # models/layers.py) ride the metrics so the epoch loop can
            # hard-error instead of training on silently-truncated convs.
            diag = jax.tree.leaves(updates.get("diagnostics", {}))
            if diag:
                metrics = dict(
                    metrics,
                    tile_overflow=jnp.max(jnp.stack([jnp.max(d) for d in diag])),
                )
            return loss, (metrics, updates.get("batch_stats", state.batch_stats))

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            rng=rng,
        )
        metrics = dict(metrics, loss=loss)
        return new_state, metrics

    return step


def make_eval_step(model, metric_fn: Callable[..., dict]):
    def step(state: TrainState, batch: dict) -> dict:
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            *_model_args(batch),
            train=False,
        )
        return metric_fn(out, batch)

    return step
