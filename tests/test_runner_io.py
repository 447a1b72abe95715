"""Tests for the MCMCRunner facade and chain IO (CSV + checkpointing)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glabc_tpu import (
    ChainWriter,
    DiagGaussian,
    MCMCRunner,
    MixtureProblem,
    load_carry,
    save_carry,
)
from glabc_tpu.samplers import init_chain_carry

PROB = MixtureProblem(0.05)
IP = DiagGaussian.create(2, 0.0, 0.0)
LP = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
THETA0 = jnp.zeros(2)


def _runner(tmp_path, **kw):
    kw.setdefault("seed", 0)
    kw.setdefault("verbose", False)
    kw.setdefault("segment_size", 100)
    return MCMCRunner(PROB, output_dir=str(tmp_path), **kw)


class TestRunnerMethods:
    def test_run_glmcmc_csv_format(self, tmp_path):
        runner = _runner(tmp_path, num_chains=2)
        chain = runner.run_glmcmc(250, THETA0, None, 0.9, LP, IP, 5)
        assert chain.shape == (2, 250, 2)
        csv = np.loadtxt(tmp_path / "glmcmc_results.csv", delimiter=",")
        # reference format: initial theta row + one row per iteration
        assert csv.shape == (250, 2)
        np.testing.assert_array_equal(csv[0], [0.0, 0.0])
        np.testing.assert_allclose(csv, chain[0], atol=1e-5)

    def test_single_chain_returns_2d(self, tmp_path):
        runner = _runner(tmp_path, num_chains=1)
        chain = runner.run_global_mcmc(120, THETA0, None, 0.5, LP, IP,
                                       output_file=None)
        assert chain.shape == (120, 2)

    @pytest.mark.slow
    def test_run_glmala(self, tmp_path):
        runner = _runner(tmp_path)
        chain = runner.run_glmala(80, THETA0, None, 0.8, IP, 5, 0.3, 20)
        assert chain.shape == (80, 2)
        assert os.path.exists(tmp_path / "glmala_results.csv")

    @pytest.mark.slow
    def test_run_glmcmc_nf(self, tmp_path):
        runner = _runner(tmp_path)
        base = DiagGaussian.create(2)
        chain = runner.run_glmcmc_nf(101, THETA0, None, 0.5, LP, base, 5, 10,
                                     2, n_layers=2, hidden=16)
        assert chain.shape == (101, 2)
        csv = np.loadtxt(tmp_path / "glmcmc_nf_results.csv", delimiter=",")
        assert csv.shape == (101, 2)

    @pytest.mark.slow
    def test_run_aglmcmc(self, tmp_path):
        runner = _runner(tmp_path)
        chain = runner.run_aglmcmc(101, THETA0, None, 1.0, LP, IP, 5, 10,
                                   0.8, 0.2)
        assert chain.shape == (101, 2)
        csv = np.loadtxt(tmp_path / "aglmcmc_results.csv", delimiter=",")
        assert csv.shape == (101, 2)

    def test_initial_y_accepted(self, tmp_path):
        runner = _runner(tmp_path)
        y0 = jnp.array([1.4, 1.6])
        chain = runner.run_glmcmc(60, THETA0, y0, 0.9, LP, IP, 5,
                                  output_file=None)
        assert chain.shape == (60, 2)

    def test_write_all_chains(self, tmp_path):
        runner = _runner(tmp_path, num_chains=3, write_chains="all")
        runner.run_glmcmc(60, THETA0, None, 0.9, LP, IP, 5,
                          output_file="multi.csv")
        for i in range(3):
            csv = np.loadtxt(tmp_path / f"multi_chain{i}.csv", delimiter=",")
            assert csv.shape == (60, 2)

    def test_seeded_reproducibility(self, tmp_path):
        r1 = _runner(tmp_path, seed=7)
        r2 = _runner(tmp_path, seed=7)
        c1 = r1.run_glmcmc(100, THETA0, None, 0.9, LP, IP, 5, output_file=None)
        c2 = r2.run_glmcmc(100, THETA0, None, 0.9, LP, IP, 5, output_file=None)
        np.testing.assert_array_equal(c1, c2)


class TestCheckpoint:
    def test_carry_roundtrip(self, tmp_path):
        carry = init_chain_carry(PROB, jax.random.PRNGKey(0), THETA0,
                                 num_chains=4)
        path = str(tmp_path / "ckpt.npz")
        save_carry(path, carry, step=123)
        restored, step = load_carry(path)
        assert step == 123
        for a, b in zip(jax.tree_util.tree_leaves(carry),
                        jax.tree_util.tree_leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_continues_identically(self, tmp_path):
        """Running 100 steps == running 50, checkpointing, resuming 50."""
        from glabc_tpu.samplers import (GLMCMCConfig, build_glmcmc_step)
        from glabc_tpu.samplers.base import run_segmented
        step = build_glmcmc_step(PROB, IP, LP, GLMCMCConfig(0.9, 5))
        batched = jax.vmap(step, in_axes=(0, None))

        c0 = init_chain_carry(PROB, jax.random.PRNGKey(3), THETA0, num_chains=2)
        _, full = run_segmented(batched, c0, 100, segment_size=100)

        c0 = init_chain_carry(PROB, jax.random.PRNGKey(3), THETA0, num_chains=2)
        mid, first = run_segmented(batched, c0, 50, segment_size=50)
        path = str(tmp_path / "mid.npz")
        save_carry(path, mid, step=50)
        restored, _ = load_carry(path)
        _, second = run_segmented(batched, restored, 50, segment_size=50)
        np.testing.assert_array_equal(
            full, np.concatenate([first, second], axis=1)
        )


class TestChainWriter:
    def test_segment_streaming(self, tmp_path):
        path = str(tmp_path / "w.csv")
        w = ChainWriter(path)
        w.write_initial(np.array([[1.0, 2.0]]))
        w.on_segment(np.arange(12, dtype=np.float32).reshape(1, 6, 2), 0)
        w.on_segment(np.arange(12, 24, dtype=np.float32).reshape(1, 6, 2), 6)
        csv = np.loadtxt(path, delimiter=",")
        assert csv.shape == (13, 2)
        np.testing.assert_array_equal(csv[0], [1.0, 2.0])
        np.testing.assert_array_equal(csv[1:], np.arange(24).reshape(12, 2))


class TestCheckpointResume:
    def test_interrupted_run_resumes_exactly(self, tmp_path):
        """Kill-and-resume reproduces the uninterrupted run bit-for-bit."""
        from glabc_tpu.samplers import run_glmcmc
        ckpt = str(tmp_path / "run.npz")
        key = jax.random.PRNGKey(9)

        full = run_glmcmc(PROB, key, 301, THETA0, IP, LP, 0.9, 5,
                          num_chains=2, segment_size=100)

        # "crash" after 2 of 3 segments: simulate by running only 201 iters
        # with checkpointing on
        part = run_glmcmc(PROB, key, 201, THETA0, IP, LP, 0.9, 5,
                          num_chains=2, segment_size=100,
                          checkpoint_path=ckpt)
        # resume to the full length
        rest = run_glmcmc(PROB, key, 301, THETA0, IP, LP, 0.9, 5,
                          num_chains=2, segment_size=100,
                          checkpoint_path=ckpt, resume=True)
        stitched = np.concatenate([part.thetas, rest.thetas], axis=1)
        np.testing.assert_array_equal(full.thetas, stitched)
        # counters carried across the resume
        np.testing.assert_array_equal(
            np.asarray(full.counts.global_attempts),
            np.asarray(rest.counts.global_attempts),
        )


def test_save_carry_path_suffix_agreement(tmp_path):
    """save_carry/load_carry/resume probes agree on one on-disk name whether
    or not the caller spelled '.npz' (ADVICE r1: resume=True silently reran
    from step 0 when the probe checked the unsuffixed path)."""
    from glabc_tpu.utils.io import carry_path, load_carry, save_carry

    bare = str(tmp_path / "ck")
    save_carry(bare, {"x": np.arange(3)}, step=5)
    assert os.path.exists(carry_path(bare))
    carry, step = load_carry(bare)                 # unsuffixed load works
    assert step == 5
    carry2, step2 = load_carry(bare + ".npz")      # suffixed load too
    np.testing.assert_array_equal(np.asarray(carry["x"]),
                                  np.asarray(carry2["x"]))
    # no stray temp file left behind (atomic replace)
    assert not [p for p in os.listdir(tmp_path) if ".tmp" in p]


def test_fused_ckpt_config_mismatch_raises(tmp_path):
    """Resuming a fused checkpoint under a different kernel/shape config must
    raise, not feed wrongly-shaped tiles (ADVICE r1)."""
    import pytest

    from glabc_tpu.samplers._fused_io import (restore_fused_ckpt,
                                              save_fused_ckpt)

    path = str(tmp_path / "fused_ck")
    meta = {"kernel": "packed", "num_chains": 64, "theta_dim": 2,
            "steps_per_call": 8, "block_chains": 32}
    state = (np.zeros((8, 16)), np.zeros((8, 16)), np.zeros((8, 16)))
    counters = (np.zeros(64), np.zeros(64), np.zeros(64))
    save_fused_ckpt(path, state, counters, 8, 1, 123, 8, take=8,
                    steps_per_call=8, meta=meta)
    ok = restore_fused_ckpt(path, meta)
    assert ok is not None and ok[5] == 8
    bad = dict(meta, kernel="unpacked", num_chains=128)
    with pytest.raises(ValueError, match="mismatch"):
        restore_fused_ckpt(path, bad)


def test_binary_sidecar_readable_midrun(tmp_path):
    """The .meta.json sidecar is rewritten per block so a crash before
    close() leaves flushed history readable (ADVICE r1)."""
    pytest.importorskip("glabc_tpu.native")
    from glabc_tpu.native import native_available
    if not native_available():
        pytest.skip("native writer unavailable")
    from glabc_tpu.utils.io import ChainWriter, read_binary_chains

    path = str(tmp_path / "chains.bin")
    w = ChainWriter(path, chains="all", use_native=True)
    w.write_initial(np.zeros((4, 2), np.float32))
    w.on_segment(np.ones((4, 3, 2), np.float32), 1)
    # simulate a crash: flush the native writer but skip the sink's close()
    w._native._w.close()
    hist = read_binary_chains(path)   # sidecar written per-block
    assert hist.shape == (4, 4, 2)
    w._native._w = None
    w.close = lambda: None


def test_fused_state_init_honors_initial_y():
    """VERDICT r1 item 8: the fused paths must honor a provided initial_y
    instead of re-simulating (scan-path/reference facade contract,
    MCMCRunner.py:17-121)."""
    from glabc_tpu.ops.pallas.mixture_kernel import fused_state_init
    from glabc_tpu.ops.pallas.packed_kernel import (packed_state_init,
                                                    unpack_history)

    key = jax.random.PRNGKey(3)
    theta0 = jnp.zeros(2)

    # broadcast (1, d) y0 -> every chain starts from the same dataset
    y_given = np.array([[1.2, 1.7]], np.float32)
    th, y, logk = fused_state_init(PROB, key, theta0, num_chains=16, y0=y_given)
    np.testing.assert_allclose(np.asarray(y)[:2, :].T,
                               np.broadcast_to(y_given, (16, 2)))
    expect_logk = np.asarray(PROB.kernel_log_prob(PROB.discrepancy(
        jnp.broadcast_to(jnp.asarray(y_given), (16, 2)))))
    np.testing.assert_allclose(np.asarray(logk)[0], expect_logk, rtol=1e-6)

    # per-chain (C, d) y0 on the packed layout
    C, pack = 32, 4
    y_per_chain = np.arange(C * 2, dtype=np.float32).reshape(C, 2)
    th_p, y_p, logk_p = packed_state_init(PROB, key, theta0,
                                          num_cols=C // pack, pack=pack,
                                          y0=y_per_chain)
    got = unpack_history(np.asarray(y_p)[None], 2)[:, 0, :]  # (C, d)
    np.testing.assert_allclose(got, y_per_chain)

    # default (y0=None) still simulates: different keys -> different y
    _, y_sim, _ = fused_state_init(PROB, key, theta0, num_chains=16)
    assert np.asarray(y_sim)[:2].std() > 0
