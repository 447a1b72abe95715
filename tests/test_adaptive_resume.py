"""Bitwise checkpoint/resume for the ADAPTIVE samplers and scan GLMALA
(VERDICT r3 item 3).

Contract under test (``_fused_io.save_epoch_ckpt`` module docstring): a run
interrupted at an aligned segment boundary and resumed with the full
``num_ite`` must reproduce the uninterrupted run EXACTLY — history rows
(short run's blocks + resumed blocks == full run's blocks, no overlap, no
gap), final carries, adaptation state (pools / KDE / flow / hat_eps), and
move counters.  The pending adaptation epoch is replayed bitwise from the
snapshot's RNG keys on resume.

The reference has no resume at all (write-only CSV flushes,
``GLMCMC_NFs.py:153-159``, ``AGLMCMC.py:275-288``) — this is a capability
the TPU framework adds; the tests pin its exactness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.samplers.aglmcmc import run_aglmcmc
from glabc_tpu.samplers.aglmcmc_fused import (
    run_aglmcmc_fused,
    run_aglmcmc_fused_mixed,
)
from glabc_tpu.samplers.glmala import run_glmala
from glabc_tpu.samplers.glmcmc_nf import run_glmcmc_nf
from glabc_tpu.samplers.glmcmc_nf_fused import (
    run_glmcmc_nf_fused,
    run_glmcmc_nf_pooled,
)

PROB = MixtureProblem(0.05)
KEY = jax.random.PRNGKey(42)
LP = DiagGaussian.create(2, 0.0, float(np.log(0.35)))
IP = DiagGaussian.create(2, 0.0, 0.0)


def _assert_resume_exact(run, num_ite, cut, tmp_path, label,
                         check_trees=()):
    """Run full; run to ``cut`` with checkpoints; resume to ``num_ite``;
    assert the stitched history and final state match the full run."""
    ck = str(tmp_path / f"{label}.ckpt")
    full = run(num_ite)
    short = run(cut, checkpoint_path=ck)
    resumed = run(num_ite, checkpoint_path=ck, resume=True)

    stitched = np.concatenate([short.thetas, resumed.thetas], axis=1)
    assert stitched.shape == full.thetas.shape, (
        f"{label}: stitched {stitched.shape} vs full {full.thetas.shape}")
    np.testing.assert_array_equal(stitched, full.thetas)
    for name in ("global_attempts", "global_accepts", "local_accepts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full.counts, name)),
            np.asarray(getattr(resumed.counts, name)), err_msg=name)
    for attr in check_trees:
        a, b = getattr(full, attr), getattr(resumed, attr)
        for la, lb in zip(jax.tree_util.tree_leaves(a),
                          jax.tree_util.tree_leaves(b)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb),
                                          err_msg=f"{label}.{attr}")
    return full, resumed


@pytest.mark.slow
class TestScanResume:
    def test_aglmcmc(self, tmp_path):
        def run(n, **kw):
            return run_aglmcmc(PROB, KEY, n, jnp.zeros(2), LP, IP,
                               global_frequency=1.0, batch_size=2,
                               step_size=5, num_chains=8, **kw)

        # seg_len = 5; cut at 11 = two full segments + 1 (1 initial row);
        # boundary at a segment edge exercises the pending-epoch replay
        _assert_resume_exact(run, 21, 11, tmp_path, "aglmcmc",
                             check_trees=("kde", "hat_eps"))

    def test_aglmcmc_gf_half(self, tmp_path):
        def run(n, **kw):
            return run_aglmcmc(PROB, KEY, n, jnp.zeros(2), LP, IP,
                               global_frequency=0.5, batch_size=2,
                               step_size=3, num_chains=4, **kw)

        _assert_resume_exact(run, 19, 13, tmp_path, "aglmcmc05",
                             check_trees=("hat_eps",))

    def test_glmcmc_nf(self, tmp_path):
        def run(n, **kw):
            return run_glmcmc_nf(PROB, KEY, n, jnp.zeros(2), LP,
                                 global_frequency=1.0, batch_size=2,
                                 step_size=4, train_steps=3, num_chains=4,
                                 n_layers=2, hidden=8, **kw)

        full, resumed = _assert_resume_exact(run, 17, 9, tmp_path, "nf",
                                             check_trees=("flow",))
        assert len(resumed.loss_hist) == len(full.loss_hist)
        np.testing.assert_array_equal(resumed.loss_hist, full.loss_hist)

    def test_glmala(self, tmp_path):
        def run(n, **kw):
            return run_glmala(PROB, KEY, n, jnp.zeros(2), IP,
                              global_frequency=0.8, batch_size=2,
                              num_grad=4, num_chains=4, segment_size=6,
                              **kw)

        _assert_resume_exact(run, 25, 13, tmp_path, "glmala")


class TestPooledResume:
    def test_glmcmc_nf_pooled(self, tmp_path):
        def run(n, **kw):
            return run_glmcmc_nf_pooled(PROB, KEY, n, jnp.zeros(2), LP,
                                        global_frequency=1.0, batch_size=2,
                                        step_size=4, train_steps=3,
                                        num_chains=4, n_layers=2, hidden=8,
                                        **kw)

        _assert_resume_exact(run, 17, 9, tmp_path, "nf_pooled",
                             check_trees=("flow",))


class TestFusedResume:
    """interpret=True runs the Pallas kernels off-TPU; the kernels are
    deterministic in the seed+call-index, so resume must still be exact."""

    def test_aglmcmc_fused(self, tmp_path):
        def run(n, **kw):
            return run_aglmcmc_fused(PROB, KEY, n, jnp.zeros(2), IP,
                                     batch_size=2, step_size=4,
                                     num_chains=128, block_chains=128,
                                     seed=3, interpret=True, **kw)

        _assert_resume_exact(run, 13, 9, tmp_path, "agl_fused",
                             check_trees=("hat_eps", "fused_state"))

    def test_aglmcmc_fused_mixed(self, tmp_path):
        def run(n, **kw):
            return run_aglmcmc_fused_mixed(
                PROB, KEY, n, jnp.zeros(2), IP, global_frequency=0.5,
                batch_size=2, step_size=2, num_chains=128,
                block_chains=128, shared_support=256, seed=3,
                interpret=True, **kw)

        # seg_len = 4
        _assert_resume_exact(run, 13, 9, tmp_path, "agl_mixed",
                             check_trees=("hat_eps", "fused_state"))

    def test_glmcmc_nf_fused(self, tmp_path):
        def run(n, **kw):
            return run_glmcmc_nf_fused(PROB, KEY, n, jnp.zeros(2),
                                       batch_size=2, step_size=4,
                                       train_steps=3, num_chains=128,
                                       block_chains=128, n_layers=2,
                                       hidden=8, seed=3, interpret=True,
                                       **kw)

        _assert_resume_exact(run, 13, 9, tmp_path, "nf_fused",
                             check_trees=("flow", "fused_state"))


class TestResumeValidation:
    def test_config_mismatch_raises(self, tmp_path):
        ck = str(tmp_path / "mism.ckpt")
        run_aglmcmc(PROB, KEY, 11, jnp.zeros(2), LP, IP,
                    global_frequency=1.0, batch_size=2, step_size=5,
                    num_chains=8, checkpoint_path=ck)
        with pytest.raises(ValueError, match="mismatch"):
            run_aglmcmc(PROB, KEY, 21, jnp.zeros(2), LP, IP,
                        global_frequency=1.0, batch_size=2, step_size=5,
                        num_chains=16, checkpoint_path=ck, resume=True)

    def test_resume_without_checkpoint_starts_fresh(self, tmp_path):
        ck = str(tmp_path / "absent.ckpt")
        res = run_aglmcmc(PROB, KEY, 11, jnp.zeros(2), LP, IP,
                          global_frequency=1.0, batch_size=2, step_size=5,
                          num_chains=8, checkpoint_path=ck, resume=True)
        assert res.thetas.shape == (8, 11, 2)
