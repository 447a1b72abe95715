"""Checkpoint/resume for the fused-kernel drivers.

The fused drivers' loop state is a handful of device tiles plus host-side
counters; snapshotting it after every kernel launch gives the same
crash-resilience contract as the scan path's ``sample_with_step``
(``checkpoint_path``/``resume``) — SURVEY §5 (the reference is write-only
CSV with no resume).

Alignment rule: the kernel always runs ``steps_per_call`` transitions per
launch, so after a ragged final segment (``take < steps_per_call``) the
carry is ahead of the recorded history.  Checkpoints are therefore only
written for aligned segments — a resume continues from the last aligned
point and replays the ragged tail bitwise (same seed/call index ⇒ same
stream), so the resumed history is gap-free.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["save_fused_ckpt", "restore_fused_ckpt",
           "save_epoch_ckpt", "restore_epoch_ckpt"]


def save_fused_ckpt(path, state, counters, steps_run, call_idx, seed, done,
                    take, steps_per_call, meta=None):
    """Snapshot the fused loop after an ALIGNED kernel launch (no-op for a
    ragged final segment — see the module docstring).

    ``meta``: dict of configuration identifiers (kernel name, num_chains,
    theta_dim, steps_per_call, ...) stored with the snapshot; a resume with
    a different configuration would silently feed wrongly-shaped tiles to
    the kernel, so :func:`restore_fused_ckpt` validates them."""
    if take != steps_per_call:
        return
    from ..utils.io import save_carry

    snap = {
        "state": tuple(np.asarray(x) for x in state),
        "counters": tuple(np.asarray(x) for x in counters),
        "steps_run": np.asarray(steps_run),
        "call_idx": np.asarray(call_idx),
        "seed": np.asarray(seed),
    }
    if meta:
        snap["meta"] = {k: np.asarray(v) for k, v in sorted(meta.items())}
    save_carry(path, snap, step=done)


def restore_fused_ckpt(path, expect_meta=None):
    """Return ``(state_tuple, (g_att, g_acc, l_acc), steps_run, call_idx,
    seed, done)`` or ``None`` if no checkpoint exists.  Counters come back
    as float64 numpy arrays, scalars as python ints.

    ``expect_meta``: the resuming run's configuration dict; raises
    ``ValueError`` if it disagrees with the snapshot's (shape/layout
    mismatches would otherwise produce silently wrong chains)."""
    from ..utils.io import carry_path, load_carry
    if not os.path.exists(carry_path(path)):
        return None

    snap, done = load_carry(path)
    if expect_meta is not None:
        saved = snap.get("meta")
        if saved is None:
            raise ValueError(
                f"checkpoint {path!r} predates config metadata; cannot "
                "verify it matches this run's configuration — delete it or "
                "pass resume=False")
        mismatches = {
            k: (saved[k].item() if k in saved else "<absent>", v)
            for k, v in expect_meta.items()
            if k not in saved or saved[k].item() != v
        }
        if mismatches:
            raise ValueError(
                "checkpoint configuration mismatch (saved vs current): "
                f"{mismatches} — resuming would misinterpret the saved "
                "tiles; delete the checkpoint or restore the original "
                "configuration")
    counters = tuple(np.asarray(x, np.float64) for x in snap["counters"])
    return (snap["state"], counters, int(snap["steps_run"]),
            int(snap["call_idx"]), int(snap["seed"]), int(done))


# --------------------------------------------------------- adaptive drivers
#
# The adaptive samplers (AGLMCMC, GLMCMC-NF) interleave segments with
# adaptation epochs.  Their checkpoints snapshot the PRE-EPOCH loop state at
# each aligned segment boundary; the driver loops run any pending epoch at
# the TOP of the next iteration, so a resume deterministically replays the
# epoch (same saved keys => bitwise-identical pools/KDE/flow) and continues
# with zero history overlap.  This also makes "interrupted exactly at a
# boundary" exact: whether the epoch runs depends on the RESUMING run's
# remaining step count, just as it would have in the uninterrupted run.

def save_epoch_ckpt(path, state, done, take, seg_len, meta=None):
    """Snapshot an adaptive driver's pre-epoch loop state after an ALIGNED
    segment (``take == seg_len``; ragged final segments are never
    checkpointed — nothing follows them).

    ``state``: arbitrary pytree (pools, flow + optimizer state, packed
    kernel tiles, RNG keys, counters...).  ``meta``: static configuration
    dict validated on restore."""
    if take != seg_len:
        return
    from ..utils.io import save_carry

    snap = {"state": state}
    if meta:
        snap["meta"] = {k: np.asarray(v) for k, v in sorted(meta.items())}
    save_carry(path, snap, step=done)


def restore_epoch_ckpt(path, expect_meta=None):
    """Return ``(state, done)`` from :func:`save_epoch_ckpt`, or ``None`` if
    no checkpoint exists.  Validates ``expect_meta`` like
    :func:`restore_fused_ckpt`."""
    from ..utils.io import carry_path, load_carry
    if not os.path.exists(carry_path(path)):
        return None
    snap, done = load_carry(path)
    if expect_meta is not None:
        saved = snap.get("meta")
        if saved is None:
            raise ValueError(
                f"checkpoint {path!r} has no config metadata; cannot verify "
                "it matches this run — delete it or pass resume=False")
        mismatches = {
            k: (saved[k].item() if k in saved else "<absent>", v)
            for k, v in expect_meta.items()
            if k not in saved or saved[k].item() != v
        }
        if mismatches:
            raise ValueError(
                "checkpoint configuration mismatch (saved vs current): "
                f"{mismatches} — delete the checkpoint or restore the "
                "original configuration")
    return snap["state"], int(done)
