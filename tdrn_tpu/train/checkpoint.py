"""Checkpoint / resume.

TPU-native rebuild of the reference's checkpointing (SURVEY.md §5.3/§5.4): the
reference calls ``torch.save(state_dict)`` every ~5k iterations and resumes
with ``--resume --start_iter`` *without* optimizer state (momentum restarts).
Here checkpoints are orbax-managed and capture the FULL train state — params,
optimizer state, and step — so resume is exact; restore-latest is automatic.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from tdrn_tpu.train.trainer import TrainState


class CheckpointManager:
    """Thin orbax wrapper bound to a train directory."""

    def __init__(self, directory: str, save_every: int = 5000, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.save_every = save_every
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def maybe_save(self, ts: TrainState, force: bool = False) -> bool:
        """Save if the step hits the cadence (call every step; cheap no-op otherwise)."""
        step = int(ts.step)
        if not force and (step == 0 or step % self.save_every != 0):
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(_to_saveable(ts)))
        return True

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        """Restore the newest checkpoint shaped like ``template`` (or None)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(_to_saveable(template))
        )
        return jax.tree.map(lambda t, r: r, template, _from_saveable(template, restored))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _to_saveable(ts: TrainState) -> dict:
    return {"params": ts.params, "opt_state": ts.opt_state, "step": ts.step}


def _from_saveable(template: TrainState, d: dict) -> TrainState:
    return TrainState(d["params"], d["opt_state"], d["step"])
