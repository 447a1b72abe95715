"""Fused AGLMCMC (pool-iSIR Pallas kernel): CPU plumbing + TPU parity tests.

CPU tests run the kernel in TPU-interpret mode, where
``pltpu.prng_random_bits`` is stubbed to zeros — every Gumbel perturbation is
the same constant, so the in-kernel streaming Gumbel-max degenerates to a
deterministic first-max argmax over ``[current] + candidates``.  That makes
the full selection/cursor/carry/resolve plumbing exactly checkable against a
numpy oracle; the *statistical* correctness of the kernel (real PRNG) is the
TPU-gated test at the bottom (run with ``GLABC_TPU_TESTS=1`` on hardware).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.ops.pallas.pool_isir_kernel import (
    PoolISIR,
    pack_pool_logw,
    pack_pool_theta,
)
from glabc_tpu.samplers.aglmcmc import (
    AGLMCMCConfig,
    _pool_from_proposals,
    make_epoch_fn,
)
from glabc_tpu.samplers.aglmcmc_fused import run_aglmcmc_fused
from glabc_tpu.samplers.chain import init_chain_carry

PROB = MixtureProblem(0.05)
IP = DiagGaussian.create(2, 0.0, 0.0)
LP = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
KEY = jax.random.PRNGKey(0)

ON_TPU = jax.devices()[0].platform == "tpu"


def _degenerate_select(cur_logw, cand_logw):
    """Selection index under interpret-mode (all-equal Gumbel) RNG:
    first-max argmax over [current] + candidates (strict-> updates keep
    the earliest maximum)."""
    allw = np.concatenate([[cur_logw], cand_logw])
    return int(np.argmax(allw))


class TestKernelOracle:
    """Raw kernel vs numpy replay on arbitrary pool data (interpret mode)."""

    def test_matches_numpy_replay(self):
        rng = np.random.RandomState(3)
        d, B, T, C = 2, 3, 7, 128
        d_pad = 8
        P = T * B
        pool_theta = rng.randn(C, P, d).astype(np.float32)
        pool_logw = rng.randn(C, P).astype(np.float32)
        # a few -inf rows (NaN-masked pool entries must never be selected)
        pool_logw[::5, 2] = -np.inf
        theta0 = rng.randn(C, d).astype(np.float32)
        logw0 = rng.randn(C).astype(np.float32)

        kern = PoolISIR(d, batch_size=B, steps_per_call=T, block_chains=128,
                        collect_history=True, interpret=True)
        pt = pack_pool_theta(jnp.asarray(pool_theta), T, B, d_pad)
        pw = pack_pool_logw(jnp.asarray(pool_logw), T, B)
        th_k = jnp.zeros((d_pad, C), jnp.float32).at[:d].set(
            jnp.asarray(theta0).T)
        th_k_out, logw_out, sel, moved, hist = kern.run(
            np.int32(11), pt, pw, th_k, jnp.asarray(logw0)[None])

        # numpy replay
        exp_theta = theta0.copy()
        exp_logw = logw0.copy()
        exp_sel = np.full((C,), -1.0, np.float32)
        exp_moved = np.zeros((C,), np.float32)
        exp_hist = np.zeros((T, C, d), np.float32)
        for t in range(T):
            for c in range(C):
                sl = slice(t * B, (t + 1) * B)
                ind = _degenerate_select(exp_logw[c], pool_logw[c, sl])
                if ind > 0:
                    slot = t * B + ind - 1
                    exp_theta[c] = pool_theta[c, slot]
                    exp_logw[c] = pool_logw[c, slot]
                    exp_sel[c] = slot
                    exp_moved[c] += 1.0
                exp_hist[t, c] = exp_theta[c]

        np.testing.assert_array_equal(np.asarray(th_k_out)[:d].T, exp_theta)
        np.testing.assert_array_equal(np.asarray(logw_out)[0], exp_logw)
        np.testing.assert_array_equal(np.asarray(sel)[0], exp_sel)
        np.testing.assert_array_equal(np.asarray(moved)[0], exp_moved)
        np.testing.assert_array_equal(
            np.moveaxis(np.asarray(hist)[:, :d, :], 2, 1), exp_hist)

    def test_no_history_mode(self):
        d, B, T, C = 2, 2, 4, 128
        kern = PoolISIR(d, batch_size=B, steps_per_call=T, block_chains=128,
                        collect_history=False, interpret=True)
        pt = jnp.zeros((T, B, 8, C), jnp.float32)
        pw = jnp.full((T, 8, C), -jnp.inf, jnp.float32)
        th = jnp.ones((8, C), jnp.float32)
        out = kern.run(np.int32(0), pt, pw, th, jnp.zeros((1, C)))
        th_out, logw_out, sel, moved, hist = out
        assert hist is None
        # all candidates -inf: every chain stays put
        np.testing.assert_array_equal(np.asarray(th_out), np.asarray(th))
        np.testing.assert_array_equal(np.asarray(sel)[0], -np.ones(C))
        np.testing.assert_array_equal(np.asarray(moved)[0], np.zeros(C))


class TestDriverOracle:
    """run_aglmcmc_fused vs a replay that reuses the library's pool/epoch
    machinery (identical keys) but does the transitions in numpy — verifies
    the pool packing, the kernel consumption order, the sel->y/logk resolve
    gather, and the cross-epoch log-weight rewiring."""

    @pytest.mark.slow
    def test_full_driver_replay(self):
        d, B, T, C = 2, 3, 6, 128
        n_epochs = 3
        num_ite = 1 + T * n_epochs
        theta0 = jnp.zeros(d)
        res = run_aglmcmc_fused(
            PROB, KEY, num_ite, theta0, IP, batch_size=B, step_size=T,
            num_chains=C, block_chains=128, seed=0, interpret=True)

        # ---- replay with identical key plumbing
        P = T * B
        cfg = AGLMCMCConfig(1.0, B, T, 0.8, 0.2, 4, 0, 0)
        key = jnp.asarray(KEY)
        k_chain, k_pool, k_loop = jax.random.split(key, 3)
        cc = init_chain_carry(PROB, k_chain, theta0, None, C)

        def init_pools(k):
            def one(kk):
                k1, k2 = jax.random.split(kk)
                th, log_q = IP.forward(k1, P)
                return _pool_from_proposals(PROB, k2, th, log_q)
            return jax.vmap(one)(jax.random.split(k, C))

        pools = jax.jit(init_pools)(k_pool)
        epoch_fn = make_epoch_fn(PROB, cfg, C)

        theta = np.array(cc.theta)
        y = np.array(cc.y)
        logk = np.array(cc.log_kernel)
        logw = np.array(PROB.prior_log_prob(cc.theta) + cc.log_kernel
                        - IP.log_prob(cc.theta))
        hat_eps = jnp.full((C,), 1.0e6, jnp.float32)
        exp_hist = [theta[:, None, :].copy()]
        exp_eps_hist = []
        for ep in range(n_epochs):
            p_theta = np.asarray(pools.theta)
            p_x = np.asarray(pools.x)
            p_dis = np.asarray(pools.dis)
            p_logw = np.asarray(pools.log_w)
            block = np.zeros((C, T, d), np.float32)
            for t in range(T):
                for c in range(C):
                    sl = slice(t * B, (t + 1) * B)
                    ind = _degenerate_select(logw[c], p_logw[c, sl])
                    if ind > 0:
                        slot = t * B + ind - 1
                        theta[c] = p_theta[c, slot]
                        logw[c] = p_logw[c, slot]
                        y[c] = p_x[c, slot]
                        logk[c] = float(
                            PROB.kernel_log_prob(jnp.asarray(p_dis[c, slot])))
                    block[c, t] = theta[c]
            exp_hist.append(block)
            if ep < n_epochs - 1:
                k_loop, k_ep = jax.random.split(k_loop)
                pools, kdes, hat_eps = epoch_fn(
                    jax.random.split(k_ep, C), pools, hat_eps)
                exp_eps_hist.append(np.asarray(hat_eps))
                logq = np.asarray(jax.vmap(
                    lambda kde, x: kde.log_prob(x))(kdes, jnp.asarray(theta)))
                logw = np.asarray(
                    PROB.prior_log_prob(jnp.asarray(theta))) + logk - logq

        expected = np.concatenate(exp_hist, axis=1)
        np.testing.assert_allclose(res.thetas, expected, atol=1e-6)
        np.testing.assert_array_equal(res.hat_eps_hist,
                                      np.stack(exp_eps_hist))
        th_f, y_f, logk_f, logw_f = res.fused_state
        np.testing.assert_allclose(np.asarray(th_f)[:d].T, theta, atol=1e-6)
        np.testing.assert_allclose(np.asarray(y_f), y, atol=1e-6)
        np.testing.assert_allclose(np.asarray(logk_f), logk, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(logw_f)[0], logw, rtol=1e-4)
        # final_carry is normalized to the scan path's AGLCarry
        from glabc_tpu.samplers.aglmcmc import AGLCarry
        assert isinstance(res.final_carry, AGLCarry)
        np.testing.assert_allclose(np.asarray(res.final_carry.theta), theta,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(res.final_carry.y), y,
                                   atol=1e-6)

    def test_ragged_final_segment_shapes(self):
        res = run_aglmcmc_fused(PROB, KEY, 10, jnp.zeros(2), IP,
                                batch_size=2, step_size=4, num_chains=128,
                                block_chains=128, seed=0, interpret=True)
        assert res.thetas.shape == (128, 10, 2)
        assert np.all(np.isfinite(res.thetas))
        assert int(res.counts.global_attempts[0]) == 9


class TestHistoryCompression:
    """``thin``/``history_dtype`` compress the async history transfer;
    semantics: ``thin=k`` keeps global iterations ``i % k == 0`` (incl. the
    initial state) — exactly ``full.thetas[:, ::k]``."""

    KW = dict(batch_size=2, step_size=4, num_chains=128, block_chains=128,
              seed=0, interpret=True)

    def test_thin_matches_strided_full_history(self):
        full = run_aglmcmc_fused(PROB, KEY, 13, jnp.zeros(2), IP, **self.KW)
        thin = run_aglmcmc_fused(PROB, KEY, 13, jnp.zeros(2), IP, thin=3,
                                 **self.KW)
        assert thin.thetas.shape == (128, 5, 2)  # iters 0,3,6,9,12
        np.testing.assert_array_equal(thin.thetas,
                                      full.thetas[:, ::3])

    def test_bfloat16_history(self):
        full = run_aglmcmc_fused(PROB, KEY, 9, jnp.zeros(2), IP, **self.KW)
        bf = run_aglmcmc_fused(PROB, KEY, 9, jnp.zeros(2), IP,
                               history_dtype="bfloat16", **self.KW)
        assert bf.thetas.dtype == jnp.bfloat16
        assert bf.thetas.shape == full.thetas.shape
        np.testing.assert_allclose(bf.thetas.astype(np.float32),
                                   full.thetas, rtol=1e-2, atol=1e-2)

    def test_incompatible_with_on_segment(self):
        with pytest.raises(ValueError, match="on_segment"):
            run_aglmcmc_fused(PROB, KEY, 9, jnp.zeros(2), IP, thin=2,
                              on_segment=lambda b, d: None, **self.KW)

    def test_nf_fused_thin_and_dtype(self):
        from glabc_tpu.samplers.glmcmc_nf_fused import run_glmcmc_nf_fused

        kw = dict(batch_size=2, step_size=4, train_steps=1, n_layers=2,
                  hidden=16, num_chains=128, block_chains=128, max_train=256,
                  seed=0, interpret=True, flow_backend="xla")
        full = run_glmcmc_nf_fused(PROB, KEY, 9, jnp.zeros(2), **kw)
        thin = run_glmcmc_nf_fused(PROB, KEY, 9, jnp.zeros(2), thin=2,
                                   history_dtype="bfloat16", **kw)
        assert thin.thetas.dtype == jnp.bfloat16
        assert thin.thetas.shape == (128, 5, 2)  # iters 0,2,4,6,8
        np.testing.assert_allclose(thin.thetas.astype(np.float32),
                                   full.thetas[:, ::2], rtol=1e-2,
                                   atol=1e-2)


class TestShardedDriver:
    """run_aglmcmc_fused(mesh=) on the 8-device CPU mesh must reproduce the
    unsharded driver EXACTLY in interpret mode: selection is deterministic
    (stubbed in-kernel PRNG) and all pool/epoch randomness comes from
    XLA-path keys that are identical in both runs — so any difference is a
    sharding-plumbing bug (specs, seed strides don't matter here, gathers)."""

    @pytest.mark.slow
    def test_sharded_matches_unsharded(self):
        from glabc_tpu.parallel import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device CPU mesh (conftest)")
        kw = dict(batch_size=3, step_size=4, num_chains=1024,
                  block_chains=128, seed=0, interpret=True)
        res = run_aglmcmc_fused(PROB, KEY, 10, jnp.zeros(2), IP, **kw)
        res_m = run_aglmcmc_fused(PROB, KEY, 10, jnp.zeros(2), IP,
                                  mesh=make_mesh(8), **kw)
        np.testing.assert_array_equal(res.thetas, res_m.thetas)
        np.testing.assert_array_equal(res.hat_eps, res_m.hat_eps)
        np.testing.assert_allclose(np.asarray(res.fused_state[3]),
                                   np.asarray(res_m.fused_state[3]),
                                   rtol=1e-6)


class TestRunnerFacade:
    """MCMCRunner.run_aglmcmc(method='fused') routes through the pool-iSIR
    kernel with the reference argument order (``MCMCRunner.py:55-76``)."""

    def test_fused_method_routes_and_writes(self, tmp_path):
        from glabc_tpu import MCMCRunner

        runner = MCMCRunner(PROB, output_dir=str(tmp_path), num_chains=128,
                            verbose=False)
        ch = runner.run_aglmcmc(13, jnp.zeros(2), None, 1.0, LP, IP,
                                batch_size=3, step_size=4, alpha=0.8,
                                hat_eps_T=0.2, method="fused",
                                block_chains=128, seed=0, interpret=True)
        assert ch.shape == (128, 13, 2)
        csv = np.loadtxt(tmp_path / "aglmcmc_results.csv", delimiter=",")
        assert csv.shape == (13, 2)
        np.testing.assert_allclose(csv, ch[0], rtol=1e-6, atol=1e-7)

    def test_fused_method_gf_lt_1_rejects_non_mixture(self, tmp_path):
        """gf<1 routes to the mixed kernel (tests/test_aglmcmc_mixed.py),
        which needs a Mixture-family problem for its in-kernel local move —
        non-Mixture problems get a clear error pointing at the scan path."""
        from glabc_tpu import MCMCRunner
        from glabc_tpu.models.problems import GKProblem

        gk = GKProblem()
        runner = MCMCRunner(gk, output_dir=str(tmp_path), num_chains=128,
                            verbose=False)
        with pytest.raises(ValueError, match="Mixture-family"):
            runner.run_aglmcmc(13, jnp.zeros(4), None, 0.5,
                               DiagGaussian.create(4),
                               DiagGaussian.create(4),
                               batch_size=3, step_size=4, alpha=0.8,
                               hat_eps_T=0.2, method="fused")


@pytest.mark.skipif(
    not (ON_TPU or os.environ.get("GLABC_TPU_TESTS")),
    reason="fused Pallas kernel needs a real TPU (interpret-mode PRNG is stubbed)",
)
class TestTPUParity:
    def test_posterior_and_annealing_parity_vs_scan(self):
        """Fused vs scan AGLMCMC at the canonical gf=1 Mixture config:
        same posterior moments, acceptance, and annealing trajectory."""
        from glabc_tpu.samplers.aglmcmc import run_aglmcmc

        num_ite, C = 2001, 512
        res_f = run_aglmcmc_fused(PROB, KEY, num_ite, jnp.zeros(2), IP,
                                  batch_size=5, step_size=200, num_chains=C,
                                  block_chains=256)
        res_s = run_aglmcmc(PROB, jax.random.PRNGKey(1), num_ite,
                            jnp.zeros(2), LP, IP, global_frequency=1.0,
                            batch_size=5, step_size=200, num_chains=64)
        burn = 400
        a_f = np.abs(res_f.thetas[:, burn:, :]).mean(axis=(0, 1))
        a_s = np.abs(res_s.thetas[:, burn:, :]).mean(axis=(0, 1))
        np.testing.assert_allclose(a_f, a_s, atol=0.08)
        acc_f = float(res_f.counts.global_accepts.sum()
                      / res_f.counts.global_attempts.sum())
        acc_s = float(np.asarray(res_s.counts.global_accepts).sum()
                      / np.asarray(res_s.counts.global_attempts).sum())
        assert abs(acc_f - acc_s) < 0.08, (acc_f, acc_s)
        # annealing trajectories agree (9 epochs is far from eps_T; the
        # check is that fused and scan anneal at the same rate)
        eps_f = res_f.hat_eps_hist.mean(axis=1)   # (epochs,)
        eps_s = res_s.hat_eps_hist.mean(axis=1)
        assert np.all(np.diff(eps_f) <= 1e-6) and np.all(np.diff(eps_s) <= 1e-6)
        np.testing.assert_allclose(eps_f[1:], eps_s[1:], rtol=0.15)
        assert abs(float(res_f.hat_eps.mean()) - float(res_s.hat_eps.mean())) < 0.1


class TestPackChunk:
    """pack_chunk sub-segment packing (the 131k-chain HBM lever): in
    interpret mode the stubbed PRNG makes selection deterministic, so the
    sub-packed run must reproduce the unchunked run exactly — the only
    nominal difference is per-launch seeding."""

    def test_subpacked_matches_unchunked(self):
        kw = dict(batch_size=2, step_size=8, num_chains=128,
                  block_chains=128, seed=0, interpret=True)
        # 1 + 2*step_size: aligned end (a ragged tail runs the two
        # configs different distances ahead of the recorded history)
        ref = run_aglmcmc_fused(PROB, KEY, 17, jnp.zeros(2), IP, **kw)
        sub = run_aglmcmc_fused(PROB, KEY, 17, jnp.zeros(2), IP,
                                pack_chunk=2, **kw)
        np.testing.assert_array_equal(ref.thetas, sub.thetas)
        np.testing.assert_array_equal(ref.hat_eps, sub.hat_eps)
        np.testing.assert_allclose(np.asarray(ref.fused_state[3]),
                                   np.asarray(sub.fused_state[3]),
                                   rtol=1e-6)

    def test_bad_chunk_raises(self):
        with pytest.raises(ValueError, match="divide"):
            run_aglmcmc_fused(PROB, KEY, 10, jnp.zeros(2), IP,
                              batch_size=2, step_size=8, num_chains=128,
                              block_chains=128, pack_chunk=3,
                              interpret=True)
