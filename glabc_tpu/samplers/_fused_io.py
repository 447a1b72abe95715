"""Checkpoint/resume for the fused-kernel drivers.

The fused drivers' loop state is a handful of device tiles plus host-side
counters; snapshotting it after every kernel launch gives the same
crash-resilience contract as the scan path's ``sample_with_step``
(``checkpoint_path``/``resume``) — SURVEY §5 (the reference is write-only
CSV with no resume).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["_save_fused", "_restore_fused"]


def _save_fused(path, state, counters, steps_run, call_idx, seed, done):
    """Snapshot the fused loop: ``state`` device tiles (tuple), counter
    arrays, and the scalars needed to continue the PRNG stream."""
    from ..utils.io import save_carry

    snap = {
        "state": tuple(np.asarray(x) for x in state),
        "counters": tuple(np.asarray(x) for x in counters),
        "steps_run": np.asarray(steps_run),
        "call_idx": np.asarray(call_idx),
        "seed": np.asarray(seed),
    }
    save_carry(path, snap, step=done)


def _restore_fused(path, mesh=None):
    """Return ``(snapshot_dict, done)`` or ``None`` if no checkpoint."""
    if not os.path.exists(path):
        return None
    from ..utils.io import load_carry

    snap, done = load_carry(path)
    return snap, int(done)
