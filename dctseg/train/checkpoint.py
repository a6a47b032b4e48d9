"""Checkpoint save/restore via Orbax.

Reference semantics (train.py:146-157, :243-263): save a dict of
{epoch, state_dict, optim_dict} every ``save_freq`` epochs plus the last-3
epochs and a final 'last'; resume restores *parameters only* (epoch and
optimizer state deliberately come from flags / fresh — a reference quirk we
keep as the default, with ``restore_opt=True`` available for true resume).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def should_save(epoch: int, save_freq: int, end_epoch: int) -> bool:
    """Reference save predicate (train.py:244-247)."""
    e = epoch + 1
    return (e % save_freq == 0
            or (end_epoch - 1 > 0 and e % (end_epoch - 1) == 0)
            or (end_epoch - 2 > 0 and e % (end_epoch - 2) == 0)
            or (end_epoch - 3 > 0 and e % (end_epoch - 3) == 0))


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))

    def save(self, epoch: int, params: Any, opt_state: Any,
             step: int, partial: bool = False) -> None:
        """``partial=True`` marks a mid-epoch (preemption) save: resume
        with ``restore_opt`` re-runs the interrupted epoch instead of
        skipping to the next one."""
        items = dict(
            params=ocp.args.StandardSave(params),
            meta=ocp.args.JsonSave(
                {"epoch": epoch, "step": step, "partial": partial}),
        )
        # converted reference checkpoints are params-only (orbax rejects
        # empty pytrees)
        if opt_state:
            items["opt_state"] = ocp.args.StandardSave(opt_state)
        if epoch in self._mngr.all_steps():
            # A partial (preemption) save can already occupy this epoch's
            # slot: after a --restore-opt resume re-runs the interrupted
            # epoch, its regular save (or a second preemption) lands on the
            # same step number, and orbax raises StepAlreadyExistsError
            # rather than overwrite.  The fresh save supersedes the stale
            # one.  (delete() is process-synchronized like save().)
            self._mngr.wait_until_finished()
            self._mngr.delete(epoch)
        self._mngr.save(epoch, args=ocp.args.Composite(**items))

    def wait(self) -> None:
        self._mngr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mngr.latest_step()

    def all_epochs(self):
        return sorted(self._mngr.all_steps())

    def restore_params(self, epoch: int, abstract_params: Any) -> Any:
        out = self._mngr.restore(epoch, args=ocp.args.Composite(
            params=ocp.args.StandardRestore(abstract_params)))
        return out["params"]

    def restore_full(self, epoch: int, abstract_params: Any,
                     abstract_opt_state: Any):
        out = self._mngr.restore(epoch, args=ocp.args.Composite(
            params=ocp.args.StandardRestore(abstract_params),
            opt_state=ocp.args.StandardRestore(abstract_opt_state),
            meta=ocp.args.JsonRestore(),
        ))
        return out["params"], out["opt_state"], out["meta"]

    def close(self) -> None:
        self._mngr.close()
