"""Orbax-managed checkpoints: async, versioned, garbage-collected.

The reference has no checkpointing at all (write-only CSV flushes, SURVEY
§5); ``save_carry``/``load_carry`` (``utils/io.py``) provide synchronous
single-file snapshots.  This module adds the production path on top of
orbax: every ``save`` is written asynchronously (the device loop is not
blocked on disk), steps are versioned under one directory, and only the
newest ``max_to_keep`` survive — so a long multi-host run can checkpoint
frequently and resume from the latest complete snapshot after a failure.

The carry can be ANY pytree (sampler carries are NamedTuples of arrays);
the tree structure is pickled once alongside the orbax step directories and
the leaves are stored as a flat dict, so restore needs no template tree.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["CheckpointManager"]


class CheckpointManager:
    """Versioned async checkpointing of scan carries via orbax.

    >>> mgr = CheckpointManager("/ckpts/run1", max_to_keep=3)
    >>> mgr.save(step, carry)            # returns immediately (async)
    >>> carry, step = mgr.restore()      # latest, or restore(step=...)
    >>> mgr.close()                      # waits for in-flight saves
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._legacy_treedef_path = os.path.join(self.directory,
                                                 "treedef.pkl")

    def _treedef_path(self, step: int) -> str:
        return os.path.join(self.directory, f"treedef_{int(step)}.pkl")

    # ------------------------------------------------------------------ save
    def save(self, step: int, carry: Any, wait: bool = False) -> None:
        """Checkpoint ``carry`` (any pytree of arrays) at ``step``.

        Asynchronous by default: the leaves are snapshotted and the write
        happens on orbax's background thread; pass ``wait=True`` (or call
        :meth:`wait`/:meth:`close`) to block until durable.

        The treedef is saved PER STEP (tiny pickle next to the orbax step
        dir), so reusing a checkpoint directory with a different carry
        structure — or restoring an old step after the structure changed —
        unflattens with the treedef that matches that step, never a stale
        one."""
        leaves, treedef = jax.tree_util.tree_flatten(carry)
        td_tmp = self._treedef_path(step) + ".tmp"
        with open(td_tmp, "wb") as f:
            pickle.dump(treedef, f)
        os.replace(td_tmp, self._treedef_path(step))
        payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
        self._mgr.save(int(step),
                       args=self._ocp.args.StandardSave(payload))
        # prune treedefs whose step was garbage-collected by orbax
        kept = set(self._mgr.all_steps()) | {int(step)}
        for name in os.listdir(self.directory):
            if name.startswith("treedef_") and name.endswith(".pkl"):
                s = name[len("treedef_"):-len(".pkl")]
                if s.isdigit() and int(s) not in kept:
                    os.remove(os.path.join(self.directory, name))
        if wait:
            self._mgr.wait_until_finished()

    # --------------------------------------------------------------- restore
    def restore(self, step: Optional[int] = None):
        """Return ``(carry, step)`` from ``step`` (default: latest)."""
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(
                f"no checkpoints under {self.directory}")
        payload = self._mgr.restore(int(step))
        td_path = self._treedef_path(step)
        if not os.path.exists(td_path):
            # checkpoints written before per-step treedefs
            td_path = self._legacy_treedef_path
        with open(td_path, "rb") as f:
            treedef = pickle.load(f)
        n = len(payload)
        leaves = [jax.numpy.asarray(payload[f"leaf_{i}"]) for i in range(n)]
        return jax.tree_util.tree_unflatten(treedef, leaves), int(step)

    # ------------------------------------------------------------------ misc
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
