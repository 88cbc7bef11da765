"""Shared task plumbing: argparse base, device mesh, jit-compiled train/eval
loops with checkpointing and JSONL metrics.

Reference parity: the train-loop halves of ``ModelNet/ModelNet.py``,
``ShapeNet/ShapeNet.py``, ``ScanNet/...`` (SURVEY §3.1): Adam + exponential
decay, periodic eval, checkpoints, console/file logging — factored once
instead of copy-pasted per task, and data-parallel over all local devices."""

from __future__ import annotations

import argparse
import signal
import time
from typing import Callable, Iterator

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel import make_mesh, replicate, shard_batch
from ..train import TrainState, init_state, make_optimizer, make_train_step
from ..train.checkpoint import Checkpointer
from ..train.metrics import MetricsLogger


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--data", type=str, default=None, help="dataset root")
    p.add_argument("--synthetic", action="store_true", help="procedural data")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--points", type=int, default=1024)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--lr-decay-steps", type=int, default=20000)
    p.add_argument("--lr-decay-rate", type=float, default=0.7)
    p.add_argument("--weight-decay", type=float, default=0.0)
    p.add_argument("--grad-clip", type=float, default=None)
    p.add_argument("--grow", type=int, default=None, help="model width knob")
    p.add_argument(
        "--pt-drop-max",
        type=float,
        default=0.0,
        help="train-time point-dropout augmentation: per-cloud drop ratio "
        "drawn from U(0, this) (the reference's ptDropOut; classification "
        "tasks default it on — density/occlusion robustness)",
    )
    p.add_argument(
        "--bn-decay-steps",
        type=int,
        default=None,
        help="enable the reference's TF1 BN decaying-momentum schedule "
        "(0.5 -> 0.99 over this many steps); default: fixed momentum 0.9",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", type=str, default=None)
    p.add_argument("--log-dir", type=str, default="logs")
    p.add_argument("--run-name", type=str, default=None)
    p.add_argument("--eval-every", type=int, default=1, help="epochs")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--protocol",
        type=str,
        default="uniform",
        choices=("uniform", "gradient", "split", "lambert", "occlusion"),
        help="non-uniform sampling protocol (robustness experiments)",
    )
    p.add_argument("--eval-only", action="store_true")
    p.add_argument(
        "--remat",
        action="store_true",
        help="rematerialize activations in the backward (jax.checkpoint "
        "around the forward). Measured on the whole-scene path (round 4, "
        "docs/ROUND4.md): NOT useful there — XLA already keeps the fused "
        "step's workspace tiny (131k pts = 0.54 GiB) and remat ADDS memory "
        "and ~1.7x time. Kept for configs where activations dominate",
    )
    p.add_argument(
        "--profile-dir",
        type=str,
        default=None,
        help="capture a jax.profiler trace of epoch 1 into this directory "
        "(view with TensorBoard/Perfetto — SURVEY §5.1)",
    )
    return p


def maybe_auto_tile_pairs(model, example_batch: dict):
    """Library-level tile auto-dispatch (VERDICT r3 #3).

    Whenever a model exposes a ``tile_pairs`` knob left unset and the
    workload is big-scene scale (points beyond the dense kernel's VMEM
    bound), size the static z-order tile-pair capacity host-side from the
    example batch (``ops.pallas.auto_tile_pairs``) and return the model with
    it set — so EVERY entry point that goes through the Runner or the export
    CLI gets the measured-best backend (tile: 3.3 Mpts/s at 32k vs bucket's
    0.4) without flags. The capacity can't be sized under jit (it is a static
    shape derived from concrete data), which is why this lives at the task
    boundary where a concrete example batch exists; direct ``model.apply``
    users at big N either pass ``tile_pairs`` themselves or get the
    capacity-free bucket fallback. Overflow on later, denser batches is still
    counted and fatal (MCConv sows it; train_epoch raises)."""
    pairs_knob = getattr(model, "tile_pairs", False)
    if pairs_knob is False:
        return model  # knob absent (small-N model family)
    pts = np.asarray(example_batch["points"])
    from ..ops.pallas.dense_conv import DENSE_MAX_N

    if pts.shape[1] <= DENSE_MAX_N:
        return model
    import jax.numpy as jnp

    from ..ops.pallas.tile_conv import auto_tile_pairs

    pts_j = jnp.asarray(pts)
    mask_j = jnp.asarray(np.asarray(example_batch["mask"]))
    if pairs_knob is None:
        # the largest level-0 site radius bounds every deeper/smaller site
        radius = float(model.radii[0]) * float(
            getattr(model, "conv_radius_scale", 2.0)
        )
        cap = auto_tile_pairs(pts_j, mask_j, radius)
        print(f"# auto tile_pairs = {cap} (N={pts.shape[1]}, r0={radius})")
        model = model.clone(tile_pairs=cap)
    if getattr(model, "tile_steps", False) is None and hasattr(
        model, "tile_sites"
    ):
        budgets = auto_tile_steps(model, pts_j, mask_j)
        print(f"# auto tile_steps = {budgets}")
        model = model.clone(tile_steps=budgets)
    return model


def auto_tile_steps(model, pts, mask, headroom: float = 1.3) -> dict:
    """Measured PER-SITE chunked-step budgets for a model's tile-kernel
    sites (``model.tile_sites()`` keys -> ``max_steps``).

    The one ``tile_pairs`` knob is sized for the WORST level-0 site; every
    other site (the stem at the unscaled radius, cross-level encoder/decoder
    convs with one small side, per-level KDEs) needs 1.5-2x fewer chunked
    steps (measured at 32k, round 4) — and padding steps cost full kernel
    compute. This builds the hierarchy once on the example batch host-side
    and measures each site's exact demand (``count_tile_steps``), with the
    same ``headroom`` contract as ``auto_tile_pairs``: a denser later scene
    overflows LOUDLY (counted, sown, fatal at the task boundary), never
    silently."""
    import jax.numpy as jnp

    from ..api.hierarchy import build_hierarchy
    from ..ops.pallas.tile_conv import count_tile_steps

    h = build_hierarchy(
        pts, mask, tuple(float(r) for r in model.radii),
        neighbor_k=model.neighbor_k, global_level=False,
        tile_pairs=model.tile_pairs,
    )
    budgets = {}
    for site in model.tile_sites(len(h.levels)):
        if site[0] == "conv":
            _, in_lvl, out_lvl, r = site
            dst, src = h.levels[out_lvl], h.levels[in_lvl]
            counts = count_tile_steps(
                dst.points, dst.mask, src.points, src.mask, float(r)
            )
        elif site[0] == "sweep":
            from ..core.sampling import count_poisson_sweep_steps

            _, lvl, r = site
            src = h.levels[lvl]
            counts = count_poisson_sweep_steps(src.points, src.mask, float(r))
        else:  # kde: self-adjacency of the source level
            _, lvl, r = site
            src = h.levels[lvl]
            counts = count_tile_steps(
                src.points, src.mask, src.points, src.mask, float(r)
            )
        need = int(np.asarray(counts).max())
        budgets[site] = -(-int(need * headroom + 1) // 16) * 16
    return budgets


class Runner:
    """Owns mesh, jitted steps, checkpointing, and the epoch loop."""

    def __init__(
        self,
        args,
        model,
        loss_fn: Callable,
        example_batch: dict,
        run_name: str,
    ):
        self.args = args
        model = maybe_auto_tile_pairs(model, example_batch)
        self.model = model
        self._loss_fn = loss_fn
        # Largest device count that divides the batch (DP shards the batch).
        n_dev = len(jax.devices())
        while args.batch % n_dev:
            n_dev -= 1
        self.mesh = make_mesh(n_dev)
        self.tx = make_optimizer(
            lr=args.lr,
            decay_steps=args.lr_decay_steps,
            decay_rate=args.lr_decay_rate,
            weight_decay=args.weight_decay,
            grad_clip=args.grad_clip,
        )
        state = init_state(
            model, self.tx, jax.random.PRNGKey(args.seed), example_batch
        )
        self.state = replicate(state, self.mesh)
        self._build_steps()

        name = args.run_name or run_name
        self.metrics = MetricsLogger(args.log_dir, name)
        self.ckpt = Checkpointer(args.ckpt_dir or f"ckpts/{name}")
        self.start_epoch = 0
        if args.resume or args.eval_only:
            self.state, extra = self.ckpt.restore(self.state)
            self.state = replicate(self.state, self.mesh)
            self.start_epoch = int(extra.get("epoch", 0))

        # Preemption safety (SURVEY §5.3): on SIGTERM/SIGINT checkpoint the
        # current state before exiting, so --resume continues seamlessly.
        self._epoch = self.start_epoch
        self._install_signal_handlers()

    def _build_steps(self) -> None:
        """(Re)jit the train/eval steps for the current ``self.model`` —
        called at init and again whenever a capacity resize clones the model
        with bigger static tile budgets."""
        model = self.model
        repl = NamedSharding(self.mesh, P())
        step = make_train_step(
            model, self.tx, self._loss_fn,
            remat=getattr(self.args, "remat", False),
        )
        self._train_step = jax.jit(step, out_shardings=(repl, repl))

        import jax.numpy as jnp

        from ..train.state import _model_args

        def eval_apply(state: TrainState, batch: dict):
            # mutable diagnostics so tile-capacity overflow is visible in
            # eval too (it would otherwise be dropped silently — a denser
            # eval scene must trigger the same resize path as training)
            out, updates = model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                *_model_args(batch),
                train=False,
                mutable=["diagnostics"],
            )
            diag = jax.tree.leaves(dict(updates).get("diagnostics", {}))
            ovf = (
                jnp.max(jnp.stack([jnp.max(d) for d in diag]))
                if diag
                else jnp.zeros((), jnp.int32)
            )
            return out, ovf

        self._eval_apply = jax.jit(eval_apply)

    def _resize_tile_capacity(self, batch: dict) -> dict:
        """Grow the model's static tile budgets to cover ``batch`` (the
        offending denser-than-example scene group) and re-jit.

        Budgets only ever GROW (elementwise max with the current ones), so a
        resize can never re-introduce overflow on earlier scenes. Returns a
        description of the change for the metrics log."""
        import jax.numpy as jnp

        from ..ops.pallas.tile_conv import auto_tile_pairs

        pts = jnp.asarray(np.asarray(batch["points"]))
        mask = jnp.asarray(np.asarray(batch["mask"]))
        model = self.model
        r0 = float(model.radii[0]) * float(
            getattr(model, "conv_radius_scale", 2.0)
        )
        old_pairs = getattr(model, "tile_pairs", None) or 0
        new_pairs = max(old_pairs, auto_tile_pairs(pts, mask, r0))
        model = model.clone(tile_pairs=new_pairs)
        event = {"tile_pairs": new_pairs, "tile_pairs_old": old_pairs}
        if getattr(model, "tile_steps", None) is not None and hasattr(
            model, "tile_sites"
        ):
            old = dict(model.tile_steps)
            fresh = auto_tile_steps(model.clone(tile_steps=None), pts, mask)
            merged = {
                k: max(old.get(k, 0), fresh.get(k, 0))
                for k in set(old) | set(fresh)
            }
            model = model.clone(tile_steps=merged)
            event["tile_steps"] = {str(k): v for k, v in merged.items()}
        self.model = model
        self._build_steps()
        return event

    def _install_signal_handlers(self) -> None:
        def handler(signum, frame):
            try:
                self.save(self._epoch)
                self.metrics.log(
                    int(jax.device_get(self.state.step)),
                    tag="preempt",
                    signal=int(signum),
                )
            finally:
                raise SystemExit(128 + signum)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:  # not the main thread (e.g. under pytest-xdist)
                pass

    def shard(self, batch: dict) -> dict:
        return shard_batch(batch, self.mesh)

    def _pad_eval_batch(self, batch: dict) -> tuple[dict, int]:
        """Pad a ragged final eval batch so its leading axis divides the mesh.

        ``shard_batch`` requires batch % n_devices == 0; real datasets produce
        remainder batches (e.g. ModelNet40: 2468 % 32 = 4). Pad up to the
        configured batch size when below it (one compiled eval shape ever —
        avoids per-remainder recompiles), else to the next mesh multiple. The
        caller slices outputs back with the returned true size."""
        b = next(iter(batch.values())).shape[0]
        n_dev = self.mesh.devices.size
        full = getattr(self.args, "batch", b)
        if b == full or (b % n_dev == 0 and b > full):
            return batch, b
        target = full if b < full else -(-b // n_dev) * n_dev
        pad = target - b
        if pad == 0:
            return batch, b
        padded = {
            k: np.concatenate([v, np.repeat(np.asarray(v)[:1], pad, axis=0)])
            for k, v in batch.items()
        }
        return padded, b

    def train_epoch(self, batches: Iterator[dict], epoch: int) -> dict:
        self._epoch = epoch
        profiling = self.args.profile_dir and epoch == self.start_epoch + 1
        if profiling:
            jax.profiler.start_trace(self.args.profile_dir)
        losses, t0, n = [], time.time(), 0
        extra_sums: dict = {}
        resizes = 0
        for batch in batches:
            sharded = self.shard(batch)
            new_state, m = self._train_step(self.state, sharded)
            # Capacity overflow is recoverable (VERDICT r4 #2): a denser-
            # than-example batch must never train on truncated neighborhoods
            # NOR kill the run at epoch end. ``self.state`` is untouched by
            # the step (no donation), so on overflow the corrupted update is
            # simply discarded, the static budgets grow to cover THIS batch
            # (auto re-size + re-jit), and the step re-runs. The per-step
            # device sync this costs only exists for tile-kernel models
            # (the diagnostic is absent otherwise).
            if "tile_overflow" in m:
                attempts = 0
                while (ovf := float(m["tile_overflow"])) > 0:
                    if attempts >= 3:
                        raise RuntimeError(
                            "tile capacity overflow persists after "
                            f"{attempts} re-sizes ({ovf:.0f} dropped steps)"
                            " — auto_tile_pairs cannot cover this batch; "
                            "raise tile_pairs manually."
                        )
                    attempts += 1
                    event = self._resize_tile_capacity(batch)
                    resizes += 1
                    self.metrics.log(
                        int(jax.device_get(self.state.step)), tag="resize",
                        tile_overflow=ovf, attempt=attempts, **event,
                    )
                    new_state, m = self._train_step(self.state, sharded)
            self.state = new_state
            losses.append(m["loss"])
            for k, v in m.items():
                if k != "loss":
                    extra_sums.setdefault(k, []).append(v)
            n += 1
            if self.args.steps_per_epoch and n >= self.args.steps_per_epoch:
                break
        jax.block_until_ready(losses[-1])
        if profiling:
            jax.profiler.stop_trace()
        out = {
            "loss": float(np.mean([float(l) for l in losses])),
            "steps": n,
            "sec": round(time.time() - t0, 2),
        }
        if resizes:
            out["capacity_resizes"] = resizes
        for k, vs in extra_sums.items():
            out[k] = float(np.mean([float(v) for v in vs]))
        self.metrics.log(int(self.state.step), tag="train", epoch=epoch, **out)
        return out

    def eval_logits(self, batch: dict):
        padded, b = self._pad_eval_batch(batch)
        out, ovf = self._eval_apply(self.state, self.shard(padded))
        attempts = 0
        while float(ovf) > 0:  # denser eval scene: same recovery as training
            if attempts >= 3:
                raise RuntimeError(
                    f"tile capacity overflow persists in eval after "
                    f"{attempts} re-sizes ({float(ovf):.0f} dropped steps)."
                )
            attempts += 1
            event = self._resize_tile_capacity(padded)
            self.metrics.log(
                int(jax.device_get(self.state.step)), tag="resize",
                tile_overflow=float(ovf), attempt=attempts, phase="eval",
                **event,
            )
            out, ovf = self._eval_apply(self.state, self.shard(padded))
        return jax.tree.map(lambda x: x[:b], out)

    def save(self, epoch: int) -> None:
        self.ckpt.save(
            jax.device_get(self.state), extra={"epoch": epoch}
        )

    def close(self) -> None:
        self.metrics.close()
        self.ckpt.close()
