"""Tests for the weighted Gaussian KDE against reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from glabc_tpu.models import KernelDensity
from glabc_tpu.ops import weighted_std

KEY = jax.random.PRNGKey(7)


def _ref_weighted_std(X, w):
    """Reference kernel_density.weighted_std (:39-68) in numpy."""
    w = w / w.sum()
    mean = (w[:, None] * X).sum(0)
    var = (w[:, None] * (X - mean) ** 2).sum(0)
    corr = max(1.0 - (w**2).sum(), 1e-10)
    return np.sqrt(var / corr)


def test_weighted_std_matches_reference_formula():
    rng = np.random.RandomState(0)
    X = rng.randn(200, 3).astype(np.float32)
    w = rng.rand(200).astype(np.float32)
    got = np.asarray(weighted_std(jnp.asarray(X), jnp.asarray(w)))
    np.testing.assert_allclose(got, _ref_weighted_std(X, w), rtol=1e-4)


def test_silverman_bandwidth_formula():
    rng = np.random.RandomState(1)
    X = rng.randn(500, 2).astype(np.float32)
    w = np.full(500, 1.0 / 500, dtype=np.float32)
    kde = KernelDensity.fit(jnp.asarray(X), jnp.asarray(w), bandwidth="silverman")
    n, d = X.shape
    h = (n * (d + 2) / 4.0) ** (-1.0 / (d + 4))
    expected = h * _ref_weighted_std(X, w)
    np.testing.assert_allclose(np.asarray(kde.bandwidth), expected, rtol=1e-4)


def test_scott_bandwidth_formula():
    rng = np.random.RandomState(2)
    X = rng.randn(300, 2).astype(np.float32)
    kde = KernelDensity.fit(jnp.asarray(X), bandwidth="scott")
    n, d = X.shape
    h = n ** (-1.0 / (d + 4))
    expected = h * _ref_weighted_std(X, np.ones(n) / n)
    np.testing.assert_allclose(np.asarray(kde.bandwidth), expected, rtol=1e-4)


def test_log_prob_vs_manual_mixture():
    """KDE with explicit bandwidth == weighted mixture of Gaussians."""
    X = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, -1.0]], dtype=np.float32)
    w = np.array([0.2, 0.5, 0.3], dtype=np.float32)
    bw = np.array([0.5, 0.8], dtype=np.float32)
    kde = KernelDensity.fit(jnp.asarray(X), jnp.asarray(w), bandwidth=jnp.asarray(bw))
    pts = np.random.RandomState(3).randn(20, 2).astype(np.float32)

    comps = np.stack(
        [scipy.stats.norm.logpdf(pts, X[i], bw).sum(-1) for i in range(3)], axis=1
    )
    # reference keeps a log(w + 1e-10) stabilizer (kernel_density.py:125)
    expected = scipy.special.logsumexp(comps + np.log(w + 1e-10), axis=1)
    np.testing.assert_allclose(kde.log_prob(jnp.asarray(pts)), expected, rtol=1e-4)


def test_sampling_moments():
    X = np.array([[0.0], [10.0]], dtype=np.float32)
    w = np.array([0.3, 0.7], dtype=np.float32)
    kde = KernelDensity.fit(jnp.asarray(X), jnp.asarray(w), bandwidth=0.1)
    s = np.asarray(kde.sample(KEY, 100_000))
    frac_hi = np.mean(s > 5.0)
    assert abs(frac_hi - 0.7) < 0.01


def test_masked_rows_do_not_contribute():
    """Zero-weight rows must be invisible to log_prob / sample / bandwidth."""
    X_full = np.array([[0.0, 0.0], [1.0, 1.0], [99.0, 99.0]], dtype=np.float32)
    w_mask = np.array([0.5, 0.5, 0.0], dtype=np.float32)
    kde_masked = KernelDensity.fit(jnp.asarray(X_full), jnp.asarray(w_mask))
    kde_sub = KernelDensity.fit(jnp.asarray(X_full[:2]), jnp.asarray(w_mask[:2]))
    np.testing.assert_allclose(
        np.asarray(kde_masked.bandwidth), np.asarray(kde_sub.bandwidth), rtol=1e-5
    )
    pts = jnp.asarray(np.array([[0.5, 0.5]], dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(kde_masked.log_prob(pts)),
        np.asarray(kde_sub.log_prob(pts)),
        atol=1e-5,
    )
    s = np.asarray(kde_masked.sample(KEY, 1000))
    assert np.all(s < 50.0)


def test_forward_returns_consistent_log_prob():
    rng = np.random.RandomState(5)
    X = rng.randn(50, 2).astype(np.float32)
    kde = KernelDensity.fit(jnp.asarray(X))
    s, lp = kde.forward(KEY, 64)
    np.testing.assert_allclose(lp, kde.log_prob(s), rtol=1e-4, atol=1e-5)


def test_kde_jit_and_vmap():
    """One KDE per chain: fit and evaluate under vmap+jit (fixed shapes)."""
    rng = np.random.RandomState(6)
    X = jnp.asarray(rng.randn(4, 100, 2).astype(np.float32))  # 4 chains
    w = jnp.asarray(rng.rand(4, 100).astype(np.float32))

    @jax.jit
    def fit_eval(Xc, wc, pts):
        kdes = jax.vmap(lambda x, ww: KernelDensity.fit(x, ww))(Xc, wc)
        return jax.vmap(lambda k, p: k.log_prob(p))(kdes, pts)

    pts = jnp.asarray(rng.randn(4, 7, 2).astype(np.float32))
    out = fit_eval(X, w, pts)
    assert out.shape == (4, 7)
    ref0 = KernelDensity.fit(X[0], w[0]).log_prob(pts[0])
    np.testing.assert_allclose(out[0], ref0, rtol=1e-5)


@pytest.mark.slow
def test_log_prob_support_chunk_matches_unchunked():
    """Streamed (support_chunk) logsumexp == full-matrix path, including
    masked zero-weight rows and a chunk size that does not divide n."""
    rng = np.random.RandomState(7)
    X = jnp.asarray(rng.randn(103, 2).astype(np.float32))
    w = jnp.asarray(rng.rand(103).astype(np.float32)).at[10:20].set(0.0)
    kde = KernelDensity.fit(X, w)
    pts = jnp.asarray(rng.randn(33, 2).astype(np.float32))
    full = kde.log_prob(pts)
    for chunk in (16, 50, 103, 1000):
        out = kde.log_prob(pts, support_chunk=chunk)
        np.testing.assert_allclose(out, full, rtol=1e-5, atol=1e-6)
    # vmapped (the epoch's usage)
    Xb = jnp.stack([X, X + 1.0])
    wb = jnp.stack([w, w])
    kdes = jax.vmap(lambda x, ww: KernelDensity.fit(x, ww))(Xb, wb)
    ptsb = jnp.stack([pts, pts])
    outb = jax.vmap(lambda k, p: k.log_prob(p, support_chunk=16))(kdes, ptsb)
    np.testing.assert_allclose(outb[0], full, rtol=1e-5, atol=1e-6)
