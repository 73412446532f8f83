"""Orbax checkpointing of the full train state.

Replaces the reference's ``torch.save``/``torch.load`` epoch checkpoints and
best-model copies (``engine/Multi_GCN_Multihead_Att_engine.py:624-643``,
resume at ``:347-357``).  Improvements over the reference: the optimizer
state and step counter are checkpointed too (the reference silently dropped
optimizer state), and saves are atomic.

Retention policy: keep the newest ``max_to_keep`` steps PLUS the best step
(by val accuracy), pruned manually after each save.  (Orbax's built-in
``best_fn`` retention keeps only the best-N, which can garbage-collect the
*latest* checkpoint and make resume silently roll training back to an old
epoch.)  The best step is tracked in ``<dir>/best.json``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        if jax.process_count() > 1:
            self._verify_shared_directory()
        self.max_to_keep = max_to_keep
        self._best_path = os.path.join(self.directory, "best.json")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=None),
        )

    def _verify_shared_directory(self) -> None:
        """Fail fast (on EVERY process, so nobody is left waiting at a
        barrier) if the checkpoint directory is not one filesystem path
        visible to all processes.

        Orbax coordinates a single global save across processes; if each
        process points at its own directory the cross-process barriers
        deadlock — observed as a silent hang in the first epoch's save of
        a 2-process CLI run.  Probe: process 0 writes a token into the
        directory, every process must read that exact token back.
        """
        from jax.experimental import multihost_utils

        token = int.from_bytes(os.urandom(4), "little") & 0x7FFFFFFF
        token = int(multihost_utils.broadcast_one_to_all(np.int32(token)))
        probe = os.path.join(self.directory, ".shared_fs_probe")
        if jax.process_index() == 0:
            try:
                with open(probe, "w") as f:
                    f.write(str(token))
            except OSError:
                pass  # read below fails too -> ok=False; never skip the
                # barrier, or the peers hang at it — the guard's own bug class
        multihost_utils.sync_global_devices("mgnns_ckpt_dir_probe_write")
        deadline = time.monotonic() + 5.0
        while True:
            try:
                with open(probe) as f:
                    ok = int(f.read()) == token
            except (OSError, ValueError):
                ok = False
            # NFS attribute/dentry caches can lag a peer's create by a few
            # seconds on a genuinely shared mount — retry before concluding
            if ok or time.monotonic() > deadline:
                break
            time.sleep(0.25)
        all_ok = bool(multihost_utils.process_allgather(np.asarray(ok)).all())
        if jax.process_index() == 0:
            try:
                os.remove(probe)
            except OSError:
                pass
        if not all_ok:
            raise RuntimeError(
                f"checkpoint directory {self.directory!r} is not shared "
                f"across the {jax.process_count()} processes (process 0's "
                "probe file was not readable everywhere — unshared, or not "
                "writable by process 0). Multihost checkpointing needs one "
                "writable directory on a filesystem every host can reach "
                "(NFS/GCS fuse/...); per-host local paths deadlock the "
                "coordinated Orbax save.")

    # ----------------------------------------------------------------- best

    def _read_best(self) -> dict | None:
        if os.path.exists(self._best_path):
            with open(self._best_path) as f:
                return json.load(f)
        return None

    def best_step(self) -> int | None:
        best = self._read_best()
        return None if best is None else int(best["step"])

    # ----------------------------------------------------------------- save

    def save(self, step: int, state: Any, metrics: dict | None = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        score = (metrics or {}).get("val_accuracy")
        if score is not None:
            best = self._read_best()
            if best is None or score > best["score"]:
                with open(self._best_path, "w") as f:
                    json.dump({"step": int(step), "score": float(score)}, f)
        self._prune()

    def _prune(self) -> None:
        steps = sorted(self._mgr.all_steps())
        keep = set(steps[-self.max_to_keep:]) if self.max_to_keep else set(steps)
        best = self.best_step()
        if best is not None:
            keep.add(best)
        for s in steps:
            if s not in keep:
                self._mgr.delete(s)

    # -------------------------------------------------------------- restore

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

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
