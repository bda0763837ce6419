"""Checkpoint / resume.

TPU-native rebuild of the reference's checkpointing (SURVEY.md §5.3/§5.4): the
reference calls ``torch.save(state_dict)`` every ~5k iterations and resumes
with ``--resume --start_iter`` *without* optimizer state (momentum restarts).
Here checkpoints are orbax-managed and capture the FULL train state — params,
optimizer state, and step — so resume is exact; restore-latest is automatic.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from tdrn_tpu.train.trainer import TrainState

META_FILENAME = "model_meta.json"


class CheckpointManager:
    """Thin orbax wrapper bound to a train directory."""

    def __init__(self, directory: str, save_every: int = 5000, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        self.save_every = save_every
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def maybe_save(self, ts: TrainState, force: bool = False,
                   step: int | None = None) -> bool:
        """Save if the step hits the cadence (call every step; cheap no-op
        otherwise). Pass ``step`` (host-side counter) to avoid fetching
        ``ts.step`` — that fetch waits on every dispatched step, serializing
        the train loop's pipelining on remote transports."""
        if step is None:
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

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def save_meta(self, meta: dict):
        """Persist the model/optimizer construction flags next to the
        checkpoints, so consumers (eval/test/serve/live) can rebuild the exact
        pytree without the user re-passing every train-time flag (a checkpoint
        trained with --stem s2d / --temporal_cell light / --grad_clip 0 has a
        different params or optimizer tree than the defaults)."""
        with open(os.path.join(self.directory, META_FILENAME), "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)

    def load_meta(self) -> Optional[dict]:
        path = os.path.join(self.directory, META_FILENAME)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def restore_params(self, template_params) -> Optional[Tuple[Any, list, list]]:
        """Params-only, subtree-tolerant restore (for inference consumers).

        Restores the latest checkpoint raw (no template) and grafts its
        ``params`` subtree onto ``template_params``: leaves present in both
        (with matching shapes) come from the checkpoint; template-only leaves
        keep their init (e.g. fresh temporal cells when evaluating a
        non-temporal checkpoint with --temporal); checkpoint-only subtrees are
        ignored (e.g. a clip-trained temporal module under single-frame eval).
        Returns (params, missing_paths, extra_paths) or None if no checkpoint.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        raw = self._restore_numpy(step)
        return graft_params(raw["params"], template_params)

    def _restore_numpy(self, step: int) -> dict:
        """Restore a checkpoint tolerating a DIFFERENT topology than it was
        saved under. A template-less ``restore()`` replays the shardings
        recorded at save time, which name concrete devices — so a checkpoint
        written by a CPU-backend trainer fails to restore in a TPU serving
        process with "Device TFRT_CPU_0 was not found" (caught by the round-3
        verify drive: live.py on the axon chip with a CPU-written ckpt). The
        fallback re-restores into a HOST NUMPY template, which sidesteps
        device placement entirely; jit device-puts the params on first use.

        Note the fallback ordering is load-bearing: ``item_metadata`` returns
        None until the manager's lazy per-item handler registration has run,
        which the (failed) plain restore attempt triggers."""
        try:
            return self._mgr.restore(step)
        except ValueError:
            pass  # saved shardings name devices absent on this backend
        meta = self._mgr.item_metadata(step)
        if meta is None:
            raise RuntimeError(
                f"cannot read checkpoint structure for step {step} in "
                f"{self.directory} (item_metadata unavailable)"
            )
        tmpl = jax.tree.map(
            lambda m: np.zeros(m.shape, m.dtype) if hasattr(m, "shape") else m,
            meta,
        )
        return self._mgr.restore(step, args=ocp.args.StandardRestore(tmpl))

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def graft_params(src, template) -> Tuple[Any, list, list]:
    """Copy matching leaves of nested-dict ``src`` onto ``template``.

    Returns (grafted_tree, missing_paths, extra_paths): ``missing`` are
    template leaves absent (or shape-mismatched) in src — they keep the
    template's values; ``extra`` are src leaves with no template counterpart.
    """
    missing, extra = [], []

    def walk(s, t, prefix):
        if not isinstance(t, dict):
            if isinstance(s, dict):
                missing.append(prefix)
                return t
            if tuple(np.shape(s)) != tuple(np.shape(t)):
                missing.append(prefix + f" (shape {np.shape(s)} != {np.shape(t)})")
                return t
            return s
        out = {}
        s = s if isinstance(s, dict) else {}
        for k, tv in t.items():
            if k in s:
                out[k] = walk(s[k], tv, f"{prefix}/{k}")
            else:
                missing.append(f"{prefix}/{k}")
                out[k] = tv
        for k in s:
            if k not in t:
                extra.append(f"{prefix}/{k}")
        return out

    return walk(src, template, ""), missing, extra


def _to_saveable(ts: TrainState) -> dict:
    return {"params": ts.params, "opt_state": ts.opt_state, "step": ts.step}


def _from_saveable(template: TrainState, d: dict) -> TrainState:
    return TrainState(d["params"], d["opt_state"], d["step"])
