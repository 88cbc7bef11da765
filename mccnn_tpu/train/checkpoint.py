"""Checkpoint / resume via orbax.

Reference parity (viscom-ulm/MCCNN): ``tf.train.Saver`` snapshots in the task
scripts + restore in the Eval scripts (SURVEY §5.4). Here the full train state
(params, batch_stats, optimizer state, step, rng) plus dataset position
metadata round-trips through orbax-checkpoint, giving preemption-safe resume
on TPU (SURVEY §5.3)."""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState, extra: dict | None = None) -> None:
        # Always write 'extra' (default epoch=0): restore() unconditionally
        # includes it in the StandardRestore template, so omitting it here
        # would make a save() without extra unrestorable (ADVICE r1).
        payload = {"state": state._asdict(), "extra": extra or {"epoch": 0}}
        self._mgr.save(
            int(state.step), args=ocp.args.StandardSave(payload)
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(
        self, template: TrainState, extra_template: dict | None = None
    ) -> tuple[TrainState, dict]:
        """Restore the latest checkpoint into the template's structure."""
        step = self._mgr.latest_step()
        if step is None:
            return template, {}
        payload = {
            "state": template._asdict(),
            "extra": {"epoch": 0} if extra_template is None else extra_template,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(payload)
        )
        state = TrainState(**restored["state"])
        return state, restored.get("extra", {})

    def close(self) -> None:
        self._mgr.close()
