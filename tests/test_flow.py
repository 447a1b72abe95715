"""Tests for the affine coupling flow."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glabc_tpu import CouplingFlow, DiagGaussian

KEY = jax.random.PRNGKey(0)


def test_identity_at_init():
    """Zero-initialized last layers => the flow is the identity map."""
    flow = CouplingFlow.create(KEY, 2, n_layers=8, hidden=32)
    x, logp = flow.forward(KEY, 256)
    np.testing.assert_allclose(
        np.asarray(logp), np.asarray(flow.base.log_prob(x)), atol=1e-5
    )
    z = flow.base.sample(KEY, 256)
    np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=1e-5)


def test_forward_log_prob_consistency_after_perturbation():
    """log_prob must invert forward exactly even for a non-trivial flow."""
    flow = CouplingFlow.create(KEY, 2, n_layers=4, hidden=16)
    # perturb parameters so the flow is not the identity
    noise = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(KEY, a.shape), flow.stack
    )
    flow = CouplingFlow(base=flow.base, stack=noise)
    x, logp = flow.forward(KEY, 128)
    np.testing.assert_allclose(
        np.asarray(flow.log_prob(x)), np.asarray(logp), rtol=1e-3, atol=1e-4
    )


def test_odd_dimension():
    flow = CouplingFlow.create(KEY, 3, n_layers=4, hidden=16)
    x, logp = flow.forward(KEY, 64)
    assert x.shape == (64, 3)
    np.testing.assert_allclose(
        np.asarray(flow.log_prob(x)), np.asarray(logp), rtol=1e-3, atol=1e-4
    )


def test_single_point_log_prob():
    flow = CouplingFlow.create(KEY, 2, n_layers=2, hidden=8)
    lp = flow.log_prob(jnp.zeros(2))
    assert lp.shape == ()


def test_training_reduces_kld():
    """A few hundred Adam steps should move the flow toward a shifted
    Gaussian target."""
    target = DiagGaussian.create(2, loc=jnp.array([2.0, -1.0]),
                                 log_scale=float(jnp.log(0.5)))
    data = target.sample(KEY, 2048)
    flow = CouplingFlow.create(KEY, 2, n_layers=8, hidden=32)
    tx = optax.adam(1e-2)
    opt = tx.init(flow)

    @jax.jit
    def step(flow, opt):
        loss, g = jax.value_and_grad(lambda f: f.forward_kld(data))(flow)
        up, opt = tx.update(g, opt, flow)
        return optax.apply_updates(flow, up), opt, loss

    loss0 = float(flow.forward_kld(data))
    for _ in range(300):
        flow, opt, loss = step(flow, opt)
    loss1 = float(loss)
    assert loss1 < loss0 - 1.0, (loss0, loss1)
    # samples should land near the target mode
    s = np.asarray(flow.sample(KEY, 1024))
    np.testing.assert_allclose(s.mean(0), [2.0, -1.0], atol=0.4)
