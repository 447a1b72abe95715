"""Tests for the orbax-managed CheckpointManager (versioned async
checkpoints; the npz save_carry/load_carry path is covered in
test_runner_io.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import MixtureProblem
from glabc_tpu.samplers import init_chain_carry
from glabc_tpu.utils import CheckpointManager

PROB = MixtureProblem(0.05)
KEY = jax.random.PRNGKey(0)


def test_carry_roundtrip(tmp_path):
    carry = init_chain_carry(PROB, KEY, jnp.zeros(2), num_chains=4)
    with CheckpointManager(str(tmp_path / "ck")) as mgr:
        mgr.save(7, carry, wait=True)
        restored, step = mgr.restore()
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(carry),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert type(restored) is type(carry)


def test_versioning_and_gc(tmp_path):
    carry = init_chain_carry(PROB, KEY, jnp.zeros(2), num_chains=2)
    with CheckpointManager(str(tmp_path / "ck"), max_to_keep=2) as mgr:
        for s in (1, 2, 3):
            mgr.save(s, carry, wait=True)
        assert mgr.latest_step() == 3
        steps = mgr.all_steps()
        assert 3 in steps and len(steps) <= 2  # oldest GC'd
        _, step = mgr.restore(2)
        assert step == 2


def test_restore_empty_raises(tmp_path):
    import pytest
    with CheckpointManager(str(tmp_path / "ck")) as mgr:
        with pytest.raises(FileNotFoundError):
            mgr.restore()


def test_treedef_tracks_structure_changes(tmp_path):
    """Per-step treedefs: restoring an old step after the carry structure
    changed (directory reuse) must unflatten with the matching treedef
    (ADVICE r1: stale treedef.pkl gave silent structure mismatch)."""
    carry_a = {"theta": jnp.zeros((2, 3)), "step": jnp.int32(0)}
    carry_b = (jnp.ones(4), {"nested": jnp.arange(2)})
    with CheckpointManager(str(tmp_path / "ck"), max_to_keep=5) as mgr:
        mgr.save(1, carry_a, wait=True)
        mgr.save(2, carry_b, wait=True)
        ra, _ = mgr.restore(1)
        rb, _ = mgr.restore(2)
    assert isinstance(ra, dict) and set(ra) == {"theta", "step"}
    assert isinstance(rb, tuple) and isinstance(rb[1], dict)
