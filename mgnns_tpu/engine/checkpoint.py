"""Orbax checkpointing of the full train state.

Replaces the reference's ``torch.save``/``torch.load`` epoch checkpoints and
best-model copies (``engine/Multi_GCN_Multihead_Att_engine.py:624-643``,
resume at ``:347-357``).  Improvements over the reference: the optimizer
state and step counter are checkpointed too (the reference silently dropped
optimizer state), and saves are atomic.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    """Thin wrapper over an Orbax CheckpointManager.

    Layout: ``<directory>/<step>/...`` for periodic saves plus a tracked
    best step (by val accuracy, like the reference's ``model_best.pth.tar``).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("val_accuracy", 0.0),
                best_mode="max",
            ),
        )

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics or {})
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def best_step(self) -> int | None:
        return self._mgr.best_step()

    def restore(self, step: int | None = None, template: Any | None = None) -> Any:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        if template is not None:
            ref = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
            return self._mgr.restore(step, args=ocp.args.StandardRestore(ref))
        return self._mgr.restore(step)

    def close(self):
        self._mgr.close()
