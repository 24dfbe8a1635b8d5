"""Checkpoint/resume via Orbax.

The reference saves a per-epoch ``checkpoint.pth.tar`` (model + optimizer +
epoch) and a weights-only ``best_model.pth`` gated on the val metric, and its
resume restores weights + epoch but *not* optimizer state
(ref: /root/reference/scripts/train_BCD.py:333-349,
/root/reference/model/utils.py:205-232). Here both model and optimizer state
round-trip losslessly (strictly better), plus a separate best-model tree.

Layout: {save_dir}/ckpt/{step}/... managed by CheckpointManager (latest kept),
{save_dir}/best/... for the metric-gated weights.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, save_dir: str, max_to_keep: int = 2):
        self.dir = os.path.abspath(os.path.join(save_dir, "ckpt"))
        self.best_dir = os.path.abspath(os.path.join(save_dir, "best"))
        os.makedirs(self.dir, exist_ok=True)
        self.mgr = ocp.CheckpointManager(
            self.dir, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep)
        )

    def save(self, step: int, state, *, metrics: Optional[dict] = None,
             wait: bool = True):
        """Checkpoint ``state`` at ``step``.

        ``wait=False`` is the async path: orbax's AsyncCheckpointer snapshots
        the (immutable) device arrays and writes in a background thread, so
        the epoch save overlaps the next epoch's train steps instead of
        stalling the device queue. Any previous in-flight save is drained
        first (orbax requires one save at a time); callers must ``wait()``
        before reading the checkpoint back or exiting the process."""
        self.mgr.wait_until_finished()
        self.mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        if wait:
            self.mgr.wait_until_finished()

    def wait(self):
        """Block until every dispatched async save has durably finished."""
        self.mgr.wait_until_finished()

    def restore(self, state_template) -> tuple[Any, int]:
        """Restore latest checkpoint into the template's structure.
        Returns (state, step); (template, 0) when nothing exists."""
        step = self.mgr.latest_step()
        if step is None:
            return state_template, 0
        restored = self.mgr.restore(step, args=ocp.args.StandardRestore(state_template))
        return restored, int(step)

    def save_best(self, variables):
        ckptr = ocp.StandardCheckpointer()
        # force=True overwrites atomically through orbax's own coordination —
        # a manual rmtree would race between processes in multi-host runs
        # (every process participates in the collective save).
        ckptr.save(self.best_dir, variables, force=True)
        ckptr.wait_until_finished()

    def restore_best(self, template):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(self.best_dir, template)

    # ------------------------------------------------------------------
    # Loop-state sidecar: host-side scalars (best metric so far, preemption
    # marker) that must survive kill→resume but don't belong in the jax
    # state tree (adding fields there would break the pytree structure of
    # existing checkpoints). Written atomically next to the orbax steps.
    # The reference loses best_pred on resume (its checkpoint.pth.tar has no
    # such field, ref: /root/reference/model/utils.py:205-232) so a resumed
    # run can overwrite best_model.pth with a worse model; the sidecar is
    # the fix.
    # ------------------------------------------------------------------

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.dir, "train_meta.json")

    def save_meta(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def load_meta(self) -> dict:
        try:
            with open(self._meta_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def restore_latest_variables(self) -> tuple[dict, int]:
        """Weights-only restore of the newest step, template-free.

        Raw-pytree restore of the saved TrainState, keeping only
        ``params``/``batch_stats``: usable without reconstructing the run's
        optimizer (whose state structure varies with --encoder_lr /
        --no-fine_tune_encoder). Returns ``(variables, step)``."""
        step = self.mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        raw = self.mgr.restore(step)
        return (
            {"params": raw["params"], "batch_stats": raw.get("batch_stats") or {}},
            int(step),
        )
