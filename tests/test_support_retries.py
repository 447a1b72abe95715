"""Truncated-prior local-move semantics: ``support_retries`` vs the
reference's unbounded re-propose loop (VERDICT r1 item 9).

The reference resamples the RW perturbation until the candidate lands inside
the prior support (``/root/reference/glabcmcmc/GLMCMC.py:92-93``) and then
applies the MH ratio WITHOUT the state-dependent truncation normalizer.  Our
``local_rw_move(support_retries=r)`` draws ``r+1`` candidates at once and
keeps the first in-support one — the same kernel truncated at ``r+1`` draws;
if all miss, the step rejects.  These tests quantify that approximation on
``GKProblem`` (box-uniform prior, so boundary contact is real):

* a rejection-sampling oracle implementing the reference loop exactly,
  compared against ``support_retries=16`` on acceptance rate and posterior
  moments (they agree within MC error: the kernels differ only on the
  all-9-miss event);
* the all-miss probability measured from the oracle's redraw distribution
  (empirically < 2e-3 per step at the canonical 0.35 proposal scale);
* ``support_retries=0`` (reject-outside — plain MH, which is *exactly*
  invariant for the target, unlike the reference's uncorrected loop) agrees
  with the oracle on posterior moments but has a lower raw acceptance rate —
  the measured divergence documented in PARITY.md.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glabc_tpu import DiagGaussian
from glabc_tpu.models.problems import GKProblem
from glabc_tpu.samplers.base import local_rw_move

EPS = 2.0
DRAWS = 200
THETA0 = (0.4, 0.5, 1.0, 0.15)
PRIOR_HI = 3.0                   # tight box: heavy boundary contact (~95% of states)
STD = 0.35                       # canonical local-proposal scale
BURN = 200


@pytest.fixture(scope="module")
def prob():
    return GKProblem(epsilon=EPS, num_draws=DRAWS, theta_true=THETA0,
                     prior_low=0.0, prior_high=PRIOR_HI)


@pytest.fixture(scope="module")
def lp():
    return DiagGaussian.create(4, 0.0, float(np.log(STD)))


def run_ours(prob, lp, retries, num_chains, num_steps, seed=0):
    th0 = jnp.asarray(THETA0, jnp.float32)

    def step(carry, k):
        th, y, lk = carry
        th2, y2, lk2, acc = local_rw_move(prob, lp, k, th, y, lk, retries)
        return (th2, y2, lk2), (th2, acc)

    @jax.jit
    def chain(key):
        y = prob.simulate(jax.random.fold_in(key, 0), th0)
        lk = prob.kernel_log_prob(prob.discrepancy(y))
        ks = jax.random.split(jax.random.fold_in(key, 1), num_steps)
        _, (ths, accs) = jax.lax.scan(step, (th0, y, lk), ks)
        return ths, accs

    keys = jax.random.split(jax.random.PRNGKey(seed), num_chains)
    ths, accs = jax.vmap(chain)(keys)
    return np.asarray(ths)[:, BURN:], np.asarray(accs)[:, BURN:]


def run_oracle(prob, num_chains, num_steps, seed=100):
    """The reference's exact semantics: re-propose until in-support, accept
    with the plain (uncorrected) MH ratio."""
    rng = np.random.default_rng(seed)
    th0 = np.asarray(THETA0, np.float64)
    lo, hi = prob.prior_low, prob.prior_high

    @jax.jit
    def sim_lk(key, th):
        y = prob.simulate(key, jnp.asarray(th, jnp.float32))
        return prob.kernel_log_prob(prob.discrepancy(y))

    all_th, all_acc, redraws = [], [], []
    kctr = jax.random.PRNGKey(seed)
    n = 0
    for c in range(num_chains):
        th = th0.copy()
        kctr, k0 = jax.random.split(kctr)
        lk = float(sim_lk(k0, th))
        ths = np.empty((num_steps, 4))
        accs = np.empty(num_steps, bool)
        for t in range(num_steps):
            draws = 0
            while True:
                draws += 1
                cand = th + rng.normal(0.0, STD, 4)
                if np.all((cand >= lo) & (cand <= hi)):
                    break
            redraws.append(draws)
            n += 1
            kctr, ks = jax.random.split(kctr)
            lk_prop = float(sim_lk(ks, cand))
            # box prior: log-densities cancel inside the support
            if np.log(rng.uniform()) < lk_prop - lk:
                th, lk = cand, lk_prop
                accs[t] = True
            else:
                accs[t] = False
            ths[t] = th
        all_th.append(ths)
        all_acc.append(accs)
    return (np.stack(all_th)[:, BURN:], np.stack(all_acc)[:, BURN:],
            np.asarray(redraws))


@pytest.fixture(scope="module")
def oracle(prob):
    return run_oracle(prob, num_chains=4, num_steps=1400)


def test_retries_matches_rejection_oracle(prob, lp, oracle):
    o_th, o_acc, _ = oracle
    ths, accs = run_ours(prob, lp, retries=16, num_chains=16, num_steps=1400)

    a_ours, a_orc = accs.mean(), o_acc.mean()
    # binomial-ish SEM, inflated 3x for chain autocorrelation
    sem = 3.0 * np.sqrt(
        a_ours * (1 - a_ours) / accs.size + a_orc * (1 - a_orc) / o_acc.size
    )
    assert abs(a_ours - a_orc) < max(4 * sem, 0.05), (a_ours, a_orc)

    m_ours = np.abs(ths.reshape(-1, 4)).mean(0)
    m_orc = np.abs(o_th.reshape(-1, 4)).mean(0)
    # RW chains are strongly autocorrelated; the oracle has only 4 chains, so
    # the band is wide — this is a same-stationary-distribution check, not a
    # per-digit one.
    np.testing.assert_allclose(m_ours, m_orc, atol=0.3)


def test_all_miss_probability_is_negligible(oracle):
    _, _, redraws = oracle
    # support_retries=16 draws 17 candidates; divergence event = first
    # in-support draw index > 17
    p_miss = (redraws > 17).mean()
    assert p_miss < 2e-3, p_miss
    # and the redraw distribution confirms boundary contact is actually
    # exercised (otherwise this test proves nothing)
    assert (redraws > 1).mean() > 0.05, redraws.mean()


def test_retries0_divergence_documented(prob, lp, oracle):
    """retries=0 rejects out-of-support proposals instead of redrawing: the
    raw acceptance rate drops by roughly the boundary-miss rate, but the
    stationary distribution stays in the same band (it is exact MH)."""
    o_th, o_acc, redraws = oracle
    ths, accs = run_ours(prob, lp, retries=0, num_chains=16, num_steps=1400)
    miss = (redraws > 1).mean()           # oracle per-step redraw frequency
    gap = o_acc.mean() - accs.mean()
    # the acceptance gap is positive and of the order of the miss rate
    assert 0.0 < gap < 1.5 * miss + 0.05, (gap, miss)
    m_ours = np.abs(ths.reshape(-1, 4)).mean(0)
    m_orc = np.abs(o_th.reshape(-1, 4)).mean(0)
    np.testing.assert_allclose(m_ours, m_orc, atol=0.3)
