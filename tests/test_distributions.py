"""Unit tests for the distribution library against closed forms / scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from glabc_tpu.models import DiagGaussian, Gamma, GaussianMixture, Uniform


KEY = jax.random.PRNGKey(0)


class TestUniform:
    def test_log_prob_inside(self):
        d = Uniform.create(2, low=-2.0, high=2.0)
        z = jnp.array([[0.0, 0.0], [1.9, -1.9]])
        expected = -np.log(4.0 * 4.0)
        np.testing.assert_allclose(d.log_prob(z), expected, rtol=1e-6)

    def test_log_prob_outside_is_neg_inf(self):
        d = Uniform.create(2, low=-2.0, high=2.0)
        z = jnp.array([[0.0, 2.5], [-3.0, 0.0]])
        assert np.all(np.isneginf(np.asarray(d.log_prob(z))))

    def test_sample_range_and_logp(self):
        d = Uniform.create(3, low=-1.0, high=5.0)
        z, logp = d.forward(KEY, 1000)
        assert z.shape == (1000, 3)
        assert np.all(np.asarray(z) >= -1.0) and np.all(np.asarray(z) <= 5.0)
        np.testing.assert_allclose(logp, -np.log(6.0**3), rtol=1e-4)

    def test_vector_bounds(self):
        d = Uniform(low=jnp.array([0.0, -1.0]), high=jnp.array([1.0, 1.0]))
        np.testing.assert_allclose(
            d.log_prob(jnp.array([0.5, 0.0])), -np.log(1.0 * 2.0), rtol=1e-6
        )


class TestDiagGaussian:
    def test_log_prob_vs_scipy(self):
        loc = np.array([0.3, -1.2, 2.0])
        log_scale = np.array([0.0, 0.5, -0.3])
        d = DiagGaussian(jnp.asarray(loc, jnp.float32), jnp.asarray(log_scale, jnp.float32))
        z = np.random.RandomState(0).randn(50, 3).astype(np.float32)
        expected = scipy.stats.norm.logpdf(z, loc, np.exp(log_scale)).sum(-1)
        np.testing.assert_allclose(d.log_prob(jnp.asarray(z)), expected, rtol=1e-4)

    def test_forward_logp_consistent(self):
        d = DiagGaussian.create(2, loc=0.0, log_scale=jnp.log(0.35))
        z, logp = d.forward(KEY, 256)
        np.testing.assert_allclose(logp, d.log_prob(z), rtol=1e-4, atol=1e-5)

    def test_sample_moments(self):
        d = DiagGaussian.create(2, loc=1.0, log_scale=jnp.log(0.5))
        z = d.sample(KEY, 200_000)
        np.testing.assert_allclose(np.mean(np.asarray(z), axis=0), 1.0, atol=0.01)
        np.testing.assert_allclose(np.std(np.asarray(z), axis=0), 0.5, atol=0.01)

    def test_cdf_vs_scipy(self):
        d = DiagGaussian.create(2, loc=0.0, log_scale=0.0)
        z = jnp.array([[0.0, 0.0], [1.0, -1.0]])
        expected = scipy.stats.norm.cdf(np.asarray(z)).prod(-1)
        np.testing.assert_allclose(d.cdf(z), expected, rtol=1e-5)


class TestGamma:
    def test_log_prob_vs_scipy(self):
        conc = np.array([2.0, 0.5])
        rate = np.array([1.0, 3.0])
        d = Gamma.create(conc, rate)
        z = np.abs(np.random.RandomState(1).randn(40, 2)).astype(np.float32) + 0.1
        expected = scipy.stats.gamma.logpdf(z, conc, scale=1.0 / rate).sum(-1)
        np.testing.assert_allclose(d.log_prob(jnp.asarray(z)), expected, rtol=1e-4)

    def test_log_prob_outside_support(self):
        d = Gamma.create([2.0], [1.0])
        assert np.isneginf(float(d.log_prob(jnp.array([-1.0]))))

    def test_sample_moments(self):
        d = Gamma.create([3.0], [2.0])  # mean 1.5, var 0.75
        z = d.sample(KEY, 200_000)
        np.testing.assert_allclose(np.mean(np.asarray(z)), 1.5, atol=0.02)
        np.testing.assert_allclose(np.var(np.asarray(z)), 0.75, atol=0.03)


class TestGaussianMixture:
    def _mix(self):
        return GaussianMixture.create(
            n_modes=2, dim=2,
            loc=[[1.5, 1.5], [-1.5, -1.5]],
            scale=[[0.3, 0.3], [0.3, 0.3]],
            weights=[0.25, 0.75],
        )

    def test_log_prob_vs_manual(self):
        m = self._mix()
        z = np.random.RandomState(2).randn(30, 2).astype(np.float32)
        comp1 = scipy.stats.norm.logpdf(z, [1.5, 1.5], [0.3, 0.3]).sum(-1)
        comp2 = scipy.stats.norm.logpdf(z, [-1.5, -1.5], [0.3, 0.3]).sum(-1)
        expected = np.logaddexp(np.log(0.25) + comp1, np.log(0.75) + comp2)
        np.testing.assert_allclose(m.log_prob(jnp.asarray(z)), expected, rtol=1e-4)

    def test_sample_mode_weights(self):
        m = self._mix()
        z = np.asarray(m.sample(KEY, 100_000))
        frac_pos = np.mean(z[:, 0] > 0)
        assert abs(frac_pos - 0.25) < 0.01

    def test_forward_consistent(self):
        m = self._mix()
        z, logp = m.forward(KEY, 128)
        np.testing.assert_allclose(logp, m.log_prob(z), rtol=1e-4, atol=1e-5)

    def test_trainable_pytree(self):
        m = self._mix()
        leaves = jax.tree_util.tree_leaves(m)
        assert len(leaves) == 3
        grads = jax.grad(lambda mm: jnp.sum(mm.log_prob(jnp.zeros((1, 2)))))(m)
        assert grads.loc.shape == m.loc.shape


def test_distributions_jittable():
    d = DiagGaussian.create(2, 0.0, 0.0)

    @jax.jit
    def f(dist, key):
        z, lp = dist.forward(key, 8)
        return jnp.sum(z) + jnp.sum(lp)

    f(d, KEY)  # must trace without error


def test_problem_dsl_reference_aliases():
    """The reference-style method names work on any ABCProblem."""
    from glabc_tpu import MixtureProblem
    prob = MixtureProblem(0.05)
    key = jax.random.PRNGKey(3)
    th = jnp.array([[0.5, 0.5], [1.0, -1.0]])
    y = prob.generate_samples(key, th)          # alias for simulate
    assert y.shape == (2, 2)
    lk = prob.calculate_log_kernel(y)           # kernel of y
    lk2 = prob.calculate_log_kernel_dis(prob.discrepancy(y))
    np.testing.assert_allclose(np.asarray(lk), np.asarray(lk2), rtol=1e-6)
    # multi-dataset alias
    ys = prob.generate_samples(key, th[0], num_samples=3)
    assert ys.shape == (3, 2)
