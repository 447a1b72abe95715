"""Statistical and structural tests for GlobalMCMC / GLMCMC on Mixture.

Parity bands come from running the reference implementation
(GLMCMC @ 20k iters, seed 0: per-dim mean(|theta|) = 1.40/1.43,
var = 1.98/2.10, move fraction 0.0088; SURVEY §4 golden-example strategy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.samplers import run_glmcmc, run_global_mcmc

PROB = MixtureProblem(0.05)
IP = DiagGaussian.create(2, 0.0, 0.0)
LP = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def glmcmc_result():
    return run_glmcmc(PROB, KEY, 1500, jnp.zeros(2), IP, LP, 0.9, 5,
                      num_chains=32, segment_size=1500)


class TestGLMCMC:
    def test_posterior_moments(self, glmcmc_result):
        ch = glmcmc_result.thetas[:, 300:, :].reshape(-1, 2)
        absmean = np.abs(ch).mean(0)
        var = ch.var(0)
        assert np.all(absmean > 1.25) and np.all(absmean < 1.65), absmean
        assert np.all(var > 1.6) and np.all(var < 2.6), var
        # symmetric bimodal posterior: raw mean near zero
        assert np.all(np.abs(ch.mean(0)) < 0.5)

    def test_shapes_and_initial_state(self, glmcmc_result):
        assert glmcmc_result.thetas.shape == (32, 1500, 2)
        np.testing.assert_array_equal(glmcmc_result.thetas[:, 0, :], 0.0)

    def test_acceptance_rates_in_reference_band(self, glmcmc_result):
        rates = glmcmc_result.acceptance_rates()
        # reference move fraction ~0.88%; wide MC band
        assert 0.002 < float(rates["overall"].mean()) < 0.05

    def test_counts_sum_to_steps(self, glmcmc_result):
        c = glmcmc_result.counts
        total = np.asarray(c.global_attempts + c.local_attempts)
        np.testing.assert_array_equal(total, 1499)

    def test_determinism(self):
        a = run_glmcmc(PROB, KEY, 300, jnp.zeros(2), IP, LP, 0.9, 5,
                       num_chains=4, segment_size=100)
        b = run_glmcmc(PROB, KEY, 300, jnp.zeros(2), IP, LP, 0.9, 5,
                       num_chains=4, segment_size=300)
        np.testing.assert_array_equal(a.thetas, b.thetas)

    def test_gf_extremes(self):
        r0 = run_glmcmc(PROB, KEY, 200, jnp.zeros(2), IP, LP, 0.0, 5,
                        num_chains=2, segment_size=200)
        assert int(np.sum(np.asarray(r0.counts.global_attempts))) == 0
        r1 = run_glmcmc(PROB, KEY, 200, jnp.zeros(2), IP, LP, 1.0, 5,
                        num_chains=2, segment_size=200)
        assert int(np.sum(np.asarray(r1.counts.local_attempts))) == 0

    def test_support_retries_runs(self):
        res = run_glmcmc(PROB, KEY, 200, jnp.zeros(2), IP, LP, 0.5, 5,
                         num_chains=2, segment_size=200, support_retries=3)
        assert np.all(np.isfinite(res.thetas))


class TestGlobalMCMC:
    def test_posterior_moments(self):
        res = run_global_mcmc(PROB, KEY, 1500, jnp.zeros(2), IP, LP, 0.5,
                              num_chains=32, segment_size=1500)
        ch = res.thetas[:, 300:, :].reshape(-1, 2)
        absmean = np.abs(ch).mean(0)
        assert np.all(absmean > 1.25) and np.all(absmean < 1.65), absmean
        var = ch.var(0)
        assert np.all(var > 1.6) and np.all(var < 2.6), var

    def test_per_chain_theta0(self):
        t0 = jnp.array([[0.5, -0.5], [1.0, 1.0], [-1.0, 2.0]])
        res = run_global_mcmc(PROB, KEY, 50, t0, IP, LP, 0.5, num_chains=3,
                              segment_size=50)
        np.testing.assert_allclose(res.thetas[:, 0, :], np.asarray(t0))


def test_exact_likelihood_stationarity():
    """Detailed-balance sanity check on a tractable target: with an
    *exact* Gaussian 'simulator' (y == theta deterministically via zero
    noise... not possible with this DSL), we instead verify invariance
    statistically: initializing chains at posterior-like points, the
    pooled moments stay in the stationary band rather than drifting."""
    k1, k2 = jax.random.split(KEY)
    # start half the chains in each mode
    signs = jnp.where((jnp.arange(16) % 2 == 0)[:, None], 1.0, -1.0)
    t0 = jnp.full((16, 2), 1.5) * signs
    res = run_glmcmc(PROB, k1, 800, t0, IP, LP, 0.9, 5, num_chains=16,
                     segment_size=800)
    ch = res.thetas.reshape(-1, 2)
    absmean = np.abs(ch).mean(0)
    assert np.all(absmean > 1.3) and np.all(absmean < 1.65)


class TestGKProblem:
    """g-and-k benchmark: posterior concentrates near the true parameters."""

    def test_simulator_shapes_and_summaries(self):
        from glabc_tpu import GKProblem
        prob = GKProblem(epsilon=2.0, num_draws=500)
        y = prob.simulate(KEY, jnp.array([3.0, 1.0, 2.0, 0.5]))
        assert y.shape == (7,)
        assert np.all(np.diff(np.asarray(y)) >= 0)  # octiles are ordered
        yb = prob.simulate(KEY, jnp.tile(jnp.array([3.0, 1.0, 2.0, 0.5]), (6, 1)))
        assert yb.shape == (6, 7)

    def test_prior_support(self):
        from glabc_tpu import GKProblem
        prob = GKProblem()
        assert np.isfinite(float(prob.prior_log_prob(jnp.full(4, 5.0))))
        assert np.isneginf(float(prob.prior_log_prob(jnp.array([11.0, 5, 5, 5]))))

    def test_glmcmc_recovers_location(self):
        from glabc_tpu import GKProblem
        prob = GKProblem(epsilon=1.0, num_draws=500)
        ip = DiagGaussian.create(4, loc=5.0, log_scale=float(jnp.log(3.0)))
        lpk = DiagGaussian.create(4, 0.0, float(jnp.log(0.25)))
        res = run_glmcmc(prob, KEY, 800, jnp.full(4, 3.0), ip, lpk, 0.7, 5,
                         num_chains=16, segment_size=800)
        ch = res.thetas[:, 200:, :].reshape(-1, 4)
        A_mean = float(ch[:, 0].mean())
        # true A = 3; the location parameter is well identified by octiles
        assert 2.0 < A_mean < 4.5, A_mean
        assert np.all(np.isfinite(ch))
