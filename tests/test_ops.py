"""Tests for resampling primitives and chain statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glabc_tpu.ops import (
    categorical_from_log_weights,
    categorical_from_weights,
    chain_summary,
    esjd,
    systematic_resample,
)
from glabc_tpu.ops import stats

KEY = jax.random.PRNGKey(11)


class TestCategorical:
    def test_distribution_matches_weights(self):
        logw = jnp.log(jnp.array([0.1, 0.6, 0.3]))
        keys = jax.random.split(KEY, 50_000)
        idx = jax.vmap(lambda k: categorical_from_log_weights(k, logw))(keys)
        counts = np.bincount(np.asarray(idx), minlength=3) / 50_000
        np.testing.assert_allclose(counts, [0.1, 0.6, 0.3], atol=0.01)

    def test_nan_and_neginf_are_zero_mass(self):
        logw = jnp.array([jnp.nan, -jnp.inf, 0.0])
        keys = jax.random.split(KEY, 200)
        idx = jax.vmap(lambda k: categorical_from_log_weights(k, logw))(keys)
        assert np.all(np.asarray(idx) == 2)

    def test_all_zero_mass_returns_zero(self):
        """All-zero weights -> index 0 (= 'keep current state' slot), matching
        the reference weight_sampling None -> stay convention."""
        logw = jnp.array([-jnp.inf, -jnp.inf, jnp.nan])
        assert int(categorical_from_log_weights(KEY, logw)) == 0

    def test_linear_weights(self):
        w = jnp.array([0.0, 2.0, 0.0, 2.0])
        keys = jax.random.split(KEY, 20_000)
        idx = jax.vmap(lambda k: categorical_from_weights(k, w))(keys)
        counts = np.bincount(np.asarray(idx), minlength=4) / 20_000
        np.testing.assert_allclose(counts, [0.0, 0.5, 0.0, 0.5], atol=0.015)


class TestSystematicResample:
    def _ref_resample(self, W, N, u0):
        """Reference resample (GLMCMC_NFs.py:29-40) in numpy."""
        n_re = np.zeros(len(W), dtype=int)
        u = (u0 + np.arange(N)) / N
        Psum = np.cumsum(W)
        i = 0
        for j in range(len(W)):
            while i < N and Psum[j] > u[i]:
                i += 1
                n_re[j] += 1
        return np.repeat(np.arange(len(W)), n_re)

    def test_counts_match_reference_loop(self):
        rng = np.random.RandomState(0)
        for trial in range(5):
            w = rng.rand(20)
            w = w / w.sum()
            key = jax.random.PRNGKey(trial)
            idx = np.asarray(systematic_resample(key, jnp.asarray(w), 64))
            u0 = float(jax.random.uniform(key, ()))
            expected = self._ref_resample(w, 64, u0)
            np.testing.assert_array_equal(np.sort(idx), np.sort(expected))

    def test_uniform_weights_resample_everything(self):
        w = jnp.full((16,), 1.0 / 16)
        idx = np.asarray(systematic_resample(KEY, w, 16))
        np.testing.assert_array_equal(np.sort(idx), np.arange(16))

    def test_point_mass(self):
        w = jnp.array([0.0, 0.0, 1.0, 0.0])
        idx = np.asarray(systematic_resample(KEY, w, 8))
        assert np.all(idx == 2)


class TestESJD:
    def _ref_esjd(self, data):
        """Reference ESJD.py:2-25 in numpy."""
        delta = data[1:] - data[:-1]
        re = delta.T @ delta / (len(data) - 1)
        return np.linalg.det(re) ** (1.0 / data.shape[1])

    def test_matches_reference_formula(self):
        rng = np.random.RandomState(3)
        data = rng.randn(500, 2).astype(np.float32)
        np.testing.assert_allclose(
            float(esjd(jnp.asarray(data))), self._ref_esjd(data), rtol=2e-3
        )

    def test_batched(self):
        rng = np.random.RandomState(4)
        data = rng.randn(3, 200, 2).astype(np.float32)
        got = np.asarray(esjd(jnp.asarray(data)))
        expected = np.array([self._ref_esjd(data[i]) for i in range(3)])
        np.testing.assert_allclose(got, expected, rtol=1e-3)

    def test_constant_chain_is_zero(self):
        data = jnp.ones((100, 2))
        assert abs(float(esjd(data))) < 1e-10


def test_chain_summary():
    rng = np.random.RandomState(5)
    chain = rng.randn(1000, 2).astype(np.float32) + np.array([1.0, -1.0])
    s = chain_summary(jnp.asarray(chain))
    np.testing.assert_allclose(np.asarray(s.mean), [1.0, -1.0], atol=0.12)
    np.testing.assert_allclose(np.asarray(s.variance), [1.0, 1.0], atol=0.15)
    np.testing.assert_allclose(
        np.asarray(s.ci_upper - s.ci_lower), 2 * 1.96 * np.sqrt(s.variance), rtol=1e-5
    )
    assert "Mean" in s.render()


class TestESS:
    def test_iid_near_n(self):
        from glabc_tpu.ops import ess
        rng = np.random.RandomState(0)
        x = rng.randn(4000, 2).astype(np.float32)
        e = np.asarray(ess(jnp.asarray(x)))
        assert np.all(e > 2000) and np.all(e < 8000), e

    def test_ar1_matches_theory(self):
        from glabc_tpu.ops import ess
        rng = np.random.RandomState(1)
        phi = 0.9
        n = 20000
        eps = rng.randn(n).astype(np.float32)
        x = np.zeros(n, np.float32)
        for i in range(1, n):
            x[i] = phi * x[i - 1] + eps[i]
        e = float(ess(jnp.asarray(x[:, None]))[0])
        tau_true = (1 + phi) / (1 - phi)  # = 19
        assert n / e == pytest.approx(tau_true, rel=0.4), (n / e, tau_true)

    def test_batched_over_chains(self):
        from glabc_tpu.ops import ess
        rng = np.random.RandomState(2)
        x = rng.randn(3, 1000, 2).astype(np.float32)
        e = np.asarray(ess(jnp.asarray(x)))
        assert e.shape == (3, 2)


def test_chain_summary_with_ess():
    from glabc_tpu.ops import chain_summary
    rng = np.random.RandomState(7)
    chain = rng.randn(4, 800, 2).astype(np.float32)
    s = chain_summary(jnp.asarray(chain), with_ess=True)
    assert s.ess is not None and s.ess.shape == (2,)
    # iid chains: total ESS near 4*800
    assert np.all(np.asarray(s.ess) > 1200)
    assert "Effective Sample Size" in s.render()


class TestRhat:
    """Rank-normalized split-R-hat (multi-chain diagnostic; no reference
    counterpart — VERDICT r1 item 10)."""

    def test_well_mixed_chains_near_one(self):
        rng = np.random.default_rng(0)
        chains = rng.normal(size=(8, 2000, 3))
        r = np.asarray(stats.rhat(chains))
        assert r.shape == (3,)
        assert np.all(r < 1.01), r

    def test_disjoint_chains_flagged(self):
        rng = np.random.default_rng(1)
        chains = rng.normal(size=(4, 500, 2))
        chains[0] += 10.0  # one chain stuck in a far mode
        r = np.asarray(stats.rhat(chains))
        assert np.all(r > 1.5), r

    def test_tail_failure_caught_by_folded_stat(self):
        # same mean/location but wildly different spread per chain: the bulk
        # rank stat alone can miss this; the folded component must flag it
        rng = np.random.default_rng(2)
        a = rng.normal(scale=0.05, size=(2, 4000, 1))
        b = rng.normal(scale=5.0, size=(2, 4000, 1))
        r = np.asarray(stats.rhat(np.concatenate([a, b], axis=0)))
        assert np.all(r > 1.1), r

    def test_ties_handled(self):
        # rejected MH proposals repeat values exactly; constant runs must not
        # produce NaN
        rng = np.random.default_rng(3)
        chains = np.repeat(rng.normal(size=(4, 250, 2)), 4, axis=1)
        r = np.asarray(stats.rhat(chains))
        assert np.all(np.isfinite(r))

    def test_summary_integration(self):
        rng = np.random.default_rng(4)
        chains = rng.normal(size=(4, 400, 2))
        s = stats.chain_summary(chains, with_rhat=True)
        assert s.rhat is not None and "R-hat" in s.render()
        s1 = stats.chain_summary(chains[:1], with_rhat=True)
        assert s1.rhat is None  # single chain: silently omitted


def test_stable_partition_indices_matches_argsort():
    from glabc_tpu.ops.resampling import stable_partition_indices

    rng = np.random.RandomState(0)
    for n in (1, 7, 64, 1000):
        for p in (0.0, 0.3, 1.0):
            ok = jnp.asarray(rng.rand(n) < p)
            got = np.asarray(stable_partition_indices(ok))
            want = np.asarray(jnp.argsort(~ok, stable=True))
            np.testing.assert_array_equal(got, want)


class TestBlockedSearchsortedTake:
    """blocked_searchsorted_take must be bitwise-identical to
    ``values[clip(searchsorted(sorted, q, 'right'), 0, n-1)]`` — ties,
    boundary queries, and pad-block edges included."""

    def _check(self, sorted_vals, queries, block=32):
        from glabc_tpu.ops.resampling import blocked_searchsorted_take

        n = sorted_vals.shape[0]
        values = np.stack([np.arange(n, dtype=np.float32),
                           np.arange(n, dtype=np.float32) * -2.0], axis=1)
        picked, idx = blocked_searchsorted_take(
            jnp.asarray(sorted_vals), jnp.asarray(queries),
            jnp.asarray(values), block=block)
        want_idx = np.clip(
            np.searchsorted(sorted_vals, queries, side="right"), 0, n - 1)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_array_equal(np.asarray(picked), values[want_idx])

    def test_random_with_ties(self):
        rng = np.random.RandomState(0)
        for n in (5, 32, 100, 1000):
            vals = np.sort(np.round(rng.rand(n) * 20) / 20).astype(np.float32)
            q = rng.rand(257).astype(np.float32) * 1.4 - 0.2
            # include exact tie values and both extremes as queries
            q = np.concatenate([q, vals[:: max(1, n // 7)],
                                [-1.0, 0.0, vals[-1], vals[-1] + 1.0]])
            self._check(vals, q.astype(np.float32))

    def test_cdf_like(self):
        rng = np.random.RandomState(1)
        w = rng.rand(1000).astype(np.float32)
        w[::3] = 0.0  # flat segments (masked support rows)
        cdf = np.cumsum(w / w.sum()).astype(np.float32)
        u = (rng.rand(4000).astype(np.float32) * cdf[-1])
        self._check(cdf, u)
        self._check(cdf, u, block=17)

    def test_degenerate_all_zero(self):
        cdf = np.zeros(64, np.float32)
        self._check(cdf, np.zeros(16, np.float32))


def test_blocked_stable_partition_take_matches_flat():
    from glabc_tpu.ops.resampling import (blocked_stable_partition_take,
                                          stable_partition_take)

    rng = np.random.RandomState(2)
    for n, n_take in ((40, 10), (4000, 1000), (257, 200)):
        for p in (0.0, 0.05, 0.5, 0.97, 1.0):
            x = rng.randn(n, 2).astype(np.float32)
            ok = jnp.asarray(rng.rand(n) < p)
            got = np.asarray(blocked_stable_partition_take(
                jnp.asarray(x), ok, n_take))
            want = np.asarray(stable_partition_take(jnp.asarray(x), ok,
                                                    n_take))
            np.testing.assert_array_equal(got, want)


def test_kde_sample_matmul_select_matches_gather():
    """The blocked matmul_select path must produce bitwise-identical
    samples to the flat gather path (same key => same u/idx/noise)."""
    from glabc_tpu.models.kde import KernelDensity

    rng = np.random.RandomState(3)
    X = rng.randn(500, 2).astype(np.float32)
    w = rng.rand(500).astype(np.float32)
    w[::4] = 0.0
    kde = KernelDensity.fit(jnp.asarray(X), jnp.asarray(w))
    key = jax.random.PRNGKey(7)
    a = np.asarray(kde.sample(key, 2000, matmul_select=True))
    b = np.asarray(kde.sample(key, 2000, matmul_select=False))
    np.testing.assert_array_equal(a, b)
