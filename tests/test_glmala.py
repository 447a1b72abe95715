"""Tests for GLMALA: CRN gradients and posterior sanity."""

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.samplers.glmala import run_glmala, synthetic_likelihood_grad

PROB = MixtureProblem(0.05)
IP = DiagGaussian.create(2, 0.0, 0.0)
KEY = jax.random.PRNGKey(0)


class TestGradient:
    def test_reproducible_from_key(self):
        """Unlike the reference (secrets-seeded CRN, SURVEY quirk 11), the
        gradient is a pure function of the PRNG key."""
        theta = jnp.array([1.0, 0.8])
        g1 = synthetic_likelihood_grad(PROB, KEY, theta, 100)
        g2 = synthetic_likelihood_grad(PROB, KEY, theta, 100)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    def test_points_toward_mode(self):
        """Averaged over keys, the ABC gradient at theta just inside the
        mode should push |theta| toward 1.5."""
        theta = jnp.array([1.2, 1.2])
        keys = jax.random.split(KEY, 32)
        grads = jax.vmap(
            lambda k: synthetic_likelihood_grad(PROB, k, theta, 200)
        )(keys)
        g = np.asarray(grads).mean(0)
        assert np.all(g > 0), g  # uphill toward +1.5 in both coords

    def test_autodiff_mode_close_to_fd(self):
        theta = jnp.array([1.0, 1.3])
        keys = jax.random.split(KEY, 64)
        g_fd = np.asarray(jax.vmap(
            lambda k: synthetic_likelihood_grad(PROB, k, theta, 200, 0.1, "crn_fd")
        )(keys)).mean(0)
        g_ad = np.asarray(jax.vmap(
            lambda k: synthetic_likelihood_grad(PROB, k, theta, 200, 0.1, "autodiff")
        )(keys)).mean(0)
        # same sign and same ballpark (fd has O(d^2) bias)
        assert np.all(np.sign(g_fd) == np.sign(g_ad))
        np.testing.assert_allclose(g_ad, g_fd, rtol=0.8, atol=1.5)


class TestSampler:
    def test_posterior_moments(self):
        res = run_glmala(PROB, KEY, 600, jnp.zeros(2), IP, 0.8, 5, 0.3, 50,
                         num_chains=16, segment_size=600)
        ch = res.thetas[:, 100:, :].reshape(-1, 2)
        absmean = np.abs(ch).mean(0)
        assert np.all(absmean > 1.2) and np.all(absmean < 1.7), absmean

    def test_refresh_grad_option_runs(self):
        res = run_glmala(PROB, KEY, 100, jnp.zeros(2), IP, 0.8, 5, 0.3, 20,
                         num_chains=2, segment_size=100,
                         refresh_grad_after_global=True)
        assert np.all(np.isfinite(res.thetas))

    def test_autodiff_mode_runs(self):
        res = run_glmala(PROB, KEY, 100, jnp.zeros(2), IP, 0.8, 5, 0.3, 20,
                         num_chains=2, segment_size=100, grad_mode="autodiff")
        assert np.all(np.isfinite(res.thetas))
