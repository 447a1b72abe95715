"""GLMCMC-NF training-cadence validation against an exact-consumption oracle.

The reference trains its flow when the proposal pool is EXHAUSTED — a
data-dependent event, since local moves don't advance the pool cursor
(``/root/reference/glabcmcmc/GLMCMC_NFs.py:112``) — and always redraws the
pool afterwards (``:125-127``).  The production fast path
(``samplers/glmcmc_nf_fused.run_glmcmc_nf_pooled``) runs fixed
``round(step_size/gf)``-step segments over slack-padded pools (no slice
reuse), and the per-step scan path (``samplers/glmcmc_nf.run_glmcmc_nf``)
additionally substitutes fresh per-move flow draws for the pool.  This file
implements the reference consumption semantics exactly — per-chain cursor,
per-chain flow trained the moment that chain's cursor hits ``step_size``
(i.e. C independent replicas of the reference's single-chain loop) — and
asserts both production paths are statistically indistinguishable from it
at gf=0.5: VERDICT r2 item 7, closing the last undocumented-by-test
divergence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.models.flows import CouplingFlow
from glabc_tpu.ops.resampling import (
    categorical_from_log_weights,
    systematic_resample,
)
from glabc_tpu.samplers.aglmcmc import _pool_from_proposals
from glabc_tpu.samplers.base import local_rw_move, tree_select
from glabc_tpu.samplers.glmcmc_nf import GLMCMCNFConfig, make_optimizer

PROB = MixtureProblem(0.05)
LP = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))

GF = 0.5
B = 4
STEP_SIZE = 20
TRAIN_STEPS = 50
N_LAYERS = 4
HIDDEN = 32
P = B * STEP_SIZE


def _broadcast_tree(tree, C):
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (C,) + x.shape), tree)


def _oracle_run(key, num_ite, num_chains):
    """Reference-exact cadence: each chain is an independent replica of the
    reference single-chain loop — its own flow + Adam state + pool, cursor
    advanced on global moves only, train-then-redraw the moment the cursor
    hits ``step_size`` (``GLMCMC_NFs.py:90-140``)."""
    C = num_chains
    cfg = GLMCMCNFConfig(GF, B, STEP_SIZE, TRAIN_STEPS, N_LAYERS, HIDDEN)
    optimizer = make_optimizer(cfg)
    k_flow, k_init, k_pool, k_run = jax.random.split(jnp.asarray(key), 4)

    flow0 = CouplingFlow.create(k_flow, 2, N_LAYERS, HIDDEN)
    flows = _broadcast_tree(flow0, C)
    opts = _broadcast_tree(optimizer.init(flow0), C)

    theta = jnp.zeros((C, 2))
    y = jax.vmap(PROB.simulate)(jax.random.split(k_init, C), theta)
    logk = PROB.kernel_log_prob(PROB.discrepancy(y))

    def one_pool(flow, kk):
        k1, k2 = jax.random.split(kk)
        th, log_q = flow.forward(k1, P)
        return _pool_from_proposals(PROB, k2, th, log_q)

    pools = jax.jit(jax.vmap(one_pool))(flows, jax.random.split(k_pool, C))
    kk = jnp.zeros((C,), jnp.int32)
    num_train = jnp.zeros((C,), jnp.int32)

    def step_one(pool, flow, th, yy, lk, cursor, k):
        k_coin, k_move = jax.random.split(k)
        is_global = jax.random.uniform(k_coin, ()) < GF

        def do_global(km):
            start = cursor * B
            ths = jax.lax.dynamic_slice_in_dim(pool.theta, start, B)
            xs = jax.lax.dynamic_slice_in_dim(pool.x, start, B)
            dss = jax.lax.dynamic_slice_in_dim(pool.dis, start, B)
            lws = jax.lax.dynamic_slice_in_dim(pool.log_w, start, B)
            lw_old = PROB.prior_log_prob(th) + lk - flow.log_prob(th)
            lw = jnp.concatenate([lw_old[None], lws])
            ind = categorical_from_log_weights(km, lw)
            thetas = jnp.concatenate([th[None], ths])
            ys = jnp.concatenate([yy[None], xs])
            lks = jnp.concatenate([lk[None], PROB.kernel_log_prob(dss)])
            return thetas[ind], ys[ind], lks[ind], ind != 0, cursor + 1

        def do_local(km):
            t2, y2, l2, acc = local_rw_move(PROB, LP, km, th, yy, lk, 0)
            return t2, y2, l2, acc, cursor

        th, yy, lk, acc, cursor = jax.lax.cond(is_global, do_global,
                                               do_local, k_move)
        return th, yy, lk, cursor, is_global, acc

    step_all = jax.jit(jax.vmap(step_one, in_axes=(0, 0, 0, 0, 0, 0, 0)))

    def train_one(flow, opt, pool, k):
        # GLMCMC_NFs.py:114-124 — resample the pool by its weights, one
        # Adam step of forward KL, NaN losses skip the update
        w = jnp.exp(pool.log_w)
        w = jnp.where(jnp.isnan(w), 0.0, w)
        w = w / jnp.sum(w)
        idx = systematic_resample(k, w, P)
        train_t = jax.lax.stop_gradient(pool.theta[idx])
        loss, grads = jax.value_and_grad(
            lambda f: f.forward_kld(train_t))(flow)
        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, jnp.nan_to_num(g), 0.0), grads)
        updates, new_opt = optimizer.update(grads, opt, flow)
        new_flow = optax.apply_updates(flow, updates)
        return (tree_select(good, new_flow, flow),
                tree_select(good, new_opt, opt))

    @jax.jit
    def adapt_all(exhausted, flows, opts, pools, kk, num_train, k_ep):
        ks = jax.random.split(k_ep, 2 * C).reshape(C, 2, 2)
        do_train = exhausted & (num_train < TRAIN_STEPS)
        new_flows, new_opts = jax.vmap(train_one)(flows, opts, pools,
                                                  ks[:, 0])
        pick = lambda m, a, b: jax.tree_util.tree_map(
            lambda x, y: jnp.where(
                m.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), a, b)
        flows = pick(do_train, new_flows, flows)
        opts = pick(do_train, new_opts, opts)
        # redraw from the (possibly updated) flow happens on EVERY
        # exhaustion, even after training stops (GLMCMC_NFs.py:125-127)
        new_pools = jax.vmap(one_pool)(flows, ks[:, 1])
        pools = pick(exhausted, new_pools, pools)
        kk = jnp.where(exhausted, 0, kk)
        num_train = num_train + do_train.astype(jnp.int32)
        return flows, opts, pools, kk, num_train

    thetas = [np.asarray(theta)[:, None, :]]
    n_global = n_global_acc = 0
    for t in range(num_ite - 1):
        k_run, k_step, k_ep = jax.random.split(k_run, 3)
        theta, y, logk, kk, was_g, acc = step_all(
            pools, flows, theta, y, logk, kk, jax.random.split(k_step, C))
        thetas.append(np.asarray(theta)[:, None, :])
        n_global += int(np.sum(np.asarray(was_g)))
        n_global_acc += int(np.sum(np.asarray(was_g) & np.asarray(acc)))
        exhausted = kk >= STEP_SIZE
        if bool(jnp.any(exhausted)):
            flows, opts, pools, kk, num_train = adapt_all(
                exhausted, flows, opts, pools, kk, num_train, k_ep)
    chains = np.concatenate(thetas, axis=1)
    return chains, n_global_acc / max(n_global, 1)


def _stats(ch):
    flat = ch.reshape(-1, 2).astype(np.float64)
    return np.abs(flat).mean(0), flat.var(0)


@pytest.mark.slow
def test_pooled_and_scan_paths_match_exact_consumption_oracle():
    C, T = 16, 3001
    oracle_chains, oracle_gacc = _oracle_run(jax.random.PRNGKey(0), T, C)

    from glabc_tpu.samplers.glmcmc_nf import run_glmcmc_nf
    from glabc_tpu.samplers.glmcmc_nf_fused import run_glmcmc_nf_pooled

    res_p = run_glmcmc_nf_pooled(
        PROB, jax.random.PRNGKey(1), T, jnp.zeros(2), LP,
        global_frequency=GF, batch_size=B, step_size=STEP_SIZE,
        train_steps=TRAIN_STEPS, num_chains=C, n_layers=N_LAYERS,
        hidden=HIDDEN)
    res_s = run_glmcmc_nf(
        PROB, jax.random.PRNGKey(2), T, jnp.zeros(2), LP,
        global_frequency=GF, batch_size=B, step_size=STEP_SIZE,
        train_steps=TRAIN_STEPS, num_chains=C, n_layers=N_LAYERS,
        hidden=HIDDEN)
    # slice-per-step cadence (the gf<1 fast path behind method='fused'):
    # same bound vs the exact-consumption oracle as the cursor cadence
    res_sl = run_glmcmc_nf_pooled(
        PROB, jax.random.PRNGKey(3), T, jnp.zeros(2), LP,
        global_frequency=GF, batch_size=B, step_size=STEP_SIZE,
        train_steps=TRAIN_STEPS, num_chains=C, n_layers=N_LAYERS,
        hidden=HIDDEN, cadence="slice")

    o_am, o_v = _stats(oracle_chains[:, T // 3:])
    burn = T // 3
    for name, res in [("pooled", res_p), ("scan", res_s),
                      ("slice", res_sl)]:
        am, v = _stats(np.asarray(res.thetas)[:, burn:])
        np.testing.assert_allclose(am, o_am, atol=0.12, err_msg=name)
        np.testing.assert_allclose(v, o_v, atol=0.35, err_msg=name)
        rates = res.acceptance_rates()
        gacc = float(np.mean(rates["global"]))
        # the cadence-sensitive statistic: slice reuse, a wrong training
        # trigger, or a broken state log-density shifts iSIR acceptance
        assert abs(gacc - oracle_gacc) < 0.05, (name, gacc, oracle_gacc)


class TestRunnerFacade:
    """MCMCRunner.run_glmcmc_nf method routing (reference argument order,
    ``MCMCRunner.py:100-121``): 'pooled' is the default fast path, 'fused'
    needs gf=1, 'scan' is the per-step path."""

    def test_pooled_default_writes_csv(self, tmp_path):
        from glabc_tpu import MCMCRunner

        runner = MCMCRunner(PROB, output_dir=str(tmp_path), num_chains=8,
                            verbose=False)
        base = DiagGaussian.create(2)
        ch = runner.run_glmcmc_nf(41, jnp.zeros(2), None, 0.5, LP, base,
                                  4, 10, 2, n_layers=2, hidden=16)
        assert ch.shape == (8, 41, 2)
        csv = np.loadtxt(tmp_path / "glmcmc_nf_results.csv", delimiter=",")
        assert csv.shape == (41, 2)
        np.testing.assert_allclose(csv, ch[0], rtol=1e-6, atol=1e-7)

    def test_fused_method_routes_both_gf_regimes(self, tmp_path):
        from glabc_tpu import MCMCRunner

        runner = MCMCRunner(PROB, output_dir=str(tmp_path), num_chains=128,
                            verbose=False)
        base = DiagGaussian.create(2)
        ch = runner.run_glmcmc_nf(9, jnp.zeros(2), None, 1.0, LP, base,
                                  3, 4, 2, method="fused", n_layers=2,
                                  hidden=16, block_chains=128, seed=0,
                                  interpret=True)
        assert ch.shape == (128, 9, 2)
        # gf < 1 routes to the slice-cadence pooled path (gather-free)
        ch2 = runner.run_glmcmc_nf(9, jnp.zeros(2), None, 0.5, LP, base,
                                   3, 4, 2, method="fused", n_layers=2,
                                   hidden=16)
        assert ch2.shape == (128, 9, 2)
        assert np.all(np.isfinite(ch2))


def test_gf1_pool_consumed_exactly_once_per_segment():
    """At gf=1 the fixed segment IS the reference cadence (cursor hits
    step_size exactly at the segment end, zero slack)."""
    from glabc_tpu.samplers.aglmcmc import default_pool_slack
    from glabc_tpu.samplers.glmcmc_nf_fused import run_glmcmc_nf_pooled

    assert default_pool_slack(STEP_SIZE, 1.0) == 0
    res = run_glmcmc_nf_pooled(
        PROB, jax.random.PRNGKey(3), 61, jnp.zeros(2), LP,
        global_frequency=1.0, batch_size=3, step_size=20,
        train_steps=TRAIN_STEPS, num_chains=4, n_layers=2, hidden=16)
    assert np.all(np.asarray(res.final_carry.kk) == 20)


def test_pooled_history_compression_and_off():
    """thin/history_dtype compress the pooled driver's returned history
    (kept iterations i % k == 0, exactly full[:, ::k]); collect_history=
    False returns only the initial row."""
    from glabc_tpu.samplers.glmcmc_nf_fused import run_glmcmc_nf_pooled

    kw = dict(global_frequency=0.5, batch_size=3, step_size=4,
              train_steps=1, num_chains=16, n_layers=2, hidden=16,
              cadence="slice")
    full = run_glmcmc_nf_pooled(PROB, jax.random.PRNGKey(4), 17,
                                jnp.zeros(2), LP, **kw)
    thin = run_glmcmc_nf_pooled(PROB, jax.random.PRNGKey(4), 17,
                                jnp.zeros(2), LP, thin=2,
                                history_dtype="bfloat16", **kw)
    assert thin.thetas.dtype == jnp.bfloat16
    assert thin.thetas.shape == (16, 9, 2)
    np.testing.assert_allclose(np.asarray(thin.thetas, np.float32),
                               np.asarray(full.thetas)[:, ::2], rtol=1e-2,
                               atol=1e-2)
    off = run_glmcmc_nf_pooled(PROB, jax.random.PRNGKey(4), 17,
                               jnp.zeros(2), LP, collect_history=False,
                               **kw)
    assert off.thetas.shape == (16, 1, 2)
