"""Tests for the adaptive samplers: GLMCMC-NF and AGLMCMC."""

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, HighDimMixtureProblem, MixtureProblem
from glabc_tpu.samplers.aglmcmc import run_aglmcmc
from glabc_tpu.samplers.glmcmc_nf import run_glmcmc_nf

PROB = MixtureProblem(0.05)
IP = DiagGaussian.create(2, 0.0, 0.0)
LP = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
KEY = jax.random.PRNGKey(0)


class TestGLMCMCNF:
    def test_end_to_end(self):
        res = run_glmcmc_nf(PROB, KEY, 601, jnp.zeros(2), LP,
                            global_frequency=0.5, batch_size=5, step_size=50,
                            train_steps=10, num_chains=8, n_layers=4,
                            hidden=32)
        assert res.thetas.shape == (8, 601, 2)
        assert np.all(np.isfinite(res.thetas))
        assert len(res.loss_hist) > 0 and np.all(np.isfinite(res.loss_hist))
        ch = res.thetas[:, 100:, :].reshape(-1, 2)
        absmean = np.abs(ch).mean(0)
        assert np.all(absmean > 1.1) and np.all(absmean < 1.8), absmean

    def test_train_steps_cap(self):
        res = run_glmcmc_nf(PROB, KEY, 401, jnp.zeros(2), LP,
                            global_frequency=0.5, batch_size=5, step_size=20,
                            train_steps=3, num_chains=2, n_layers=2, hidden=16)
        assert len(res.loss_hist) == 3  # capped despite more epochs

    def test_flow_actually_adapts(self):
        res = run_glmcmc_nf(PROB, KEY, 401, jnp.zeros(2), LP,
                            global_frequency=0.5, batch_size=10, step_size=40,
                            train_steps=5, num_chains=4, n_layers=4, hidden=32)
        # trained flow samples should concentrate tighter than N(0, I)
        s = np.asarray(res.flow.sample(KEY, 512))
        assert np.abs(s).mean() < 2.0 and np.all(np.isfinite(s))


class TestAGLMCMC:
    def test_end_to_end_and_annealing(self):
        res = run_aglmcmc(PROB, KEY, 601, jnp.zeros(2), LP, IP,
                          global_frequency=1.0, batch_size=5, step_size=50,
                          alpha=0.8, hat_eps_T=0.2, num_chains=8)
        assert res.thetas.shape == (8, 601, 2)
        assert np.all(np.isfinite(res.thetas))
        # hat_eps anneals monotonically down toward the target
        hist = res.hat_eps_hist  # (epochs, C)
        assert hist is not None and hist.shape[0] >= 2
        assert np.all(np.diff(hist, axis=0) <= 1e-6)
        assert np.all(res.hat_eps >= 0.2 - 1e-6)
        ch = res.thetas[:, 100:, :].reshape(-1, 2)
        absmean = np.abs(ch).mean(0)
        assert np.all(absmean > 1.1) and np.all(absmean < 1.8), absmean

    def test_adaptation_improves_acceptance(self):
        """The fitted KDE proposal should accept global moves more often
        than the plain-prior iSIR proposal (that is its entire point)."""
        res_agl = run_aglmcmc(PROB, KEY, 801, jnp.zeros(2), LP, IP,
                              global_frequency=1.0, batch_size=5,
                              step_size=50, alpha=0.8, hat_eps_T=0.2,
                              num_chains=8)
        from glabc_tpu.samplers import run_glmcmc
        res_plain = run_glmcmc(PROB, KEY, 801, jnp.zeros(2), IP, LP, 1.0, 5,
                               num_chains=8, segment_size=801)
        acc_agl = float(res_agl.acceptance_rates()["global"].mean())
        acc_plain = float(res_plain.acceptance_rates()["global"].mean())
        assert acc_agl > acc_plain, (acc_agl, acc_plain)

    def test_local_moves_mixed_in(self):
        res = run_aglmcmc(PROB, KEY, 301, jnp.zeros(2), LP, IP,
                          global_frequency=0.5, batch_size=5, step_size=30,
                          alpha=0.8, hat_eps_T=0.2, num_chains=4)
        assert int(np.sum(np.asarray(res.counts.local_attempts))) > 0
        assert np.all(np.isfinite(res.thetas))

    def test_high_dim_problem(self):
        """Driver config 5: AGLMCMC on a higher-dim simulator."""
        prob = HighDimMixtureProblem(dim=6, epsilon=0.5)
        lp = DiagGaussian.create(6, 0.0, float(jnp.log(0.35)))
        ip = DiagGaussian.create(6, 0.0, 0.0)
        res = run_aglmcmc(prob, KEY, 301, jnp.zeros(6), lp, ip,
                          global_frequency=1.0, batch_size=5, step_size=30,
                          alpha=0.8, hat_eps_T=0.6, num_chains=4)
        assert res.thetas.shape == (4, 301, 6)
        assert np.all(np.isfinite(res.thetas))


def test_nf_chain_state_training_mode():
    """train_on='chain_states': the flow is fit on pooled vmapped chain
    states and should concentrate near the posterior modes (|theta|~1.5)."""
    res = run_glmcmc_nf(PROB, KEY, 801, jnp.full(2, 1.5), LP,
                        global_frequency=0.5, batch_size=5, step_size=20,
                        train_steps=30, num_chains=64, n_layers=4, hidden=32,
                        train_on="chain_states")
    assert np.all(np.isfinite(res.loss_hist))
    s = np.asarray(res.flow.sample(KEY, 2048))
    # flow samples should concentrate away from 0 toward the mode radius
    assert 0.8 < np.abs(s).mean() < 2.2, np.abs(s).mean()
    # and losses should generally decrease
    assert np.mean(res.loss_hist[-5:]) < np.mean(res.loss_hist[:5])


def test_aglmcmc_shared_adaptation():
    """Cross-chain shared KDE + global epsilon quantile: correct posterior
    and annealing, with one KDE shared by all chains."""
    res = run_aglmcmc(PROB, KEY, 601, jnp.zeros(2), LP, IP,
                      global_frequency=1.0, batch_size=5, step_size=50,
                      alpha=0.8, hat_eps_T=0.2, num_chains=8,
                      shared_adaptation=True, shared_support=512)
    assert res.thetas.shape == (8, 601, 2)
    assert np.all(np.isfinite(res.thetas))
    # shared hat_eps is a scalar history, monotone toward the target
    hist = res.hat_eps_hist
    assert hist is not None and hist.ndim == 1
    assert np.all(np.diff(hist) <= 1e-6)
    ch = res.thetas[:, 100:, :].reshape(-1, 2)
    absmean = np.abs(ch).mean(0)
    assert np.all(absmean > 1.1) and np.all(absmean < 1.8), absmean
    # shared KDE support has the compressed size
    assert res.kde.X.shape == (512, 2)
