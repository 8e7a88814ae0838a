"""Orbax checkpointing.

Upgrades the reference's ``torch.save(state_dict)`` per-epoch snapshots
(``models/multimodal_classifier.py:263-265``; no optimizer state, no step,
no mid-epoch resume — ``kitti/train_classifier.py:150-154``) to full
train-state checkpoints: params + BatchNorm stats + Adam moments + step
counter, with atomic writes and retention.
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from .engine import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, state: TrainState, *, metrics: Optional[dict] = None):
        step = int(state.step)
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState,
                step: Optional[int] = None) -> TrainState:
        """Restore into the structure of ``template`` (an initialised state)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()
