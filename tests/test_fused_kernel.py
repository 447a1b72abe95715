"""Fused Pallas kernel tests — require real TPU hardware.

CI forces the CPU backend (conftest), where the Mosaic interpreter stubs
``pltpu.prng_random_bits`` to zeros, so these tests are TPU-only and skip in
CI.  The same checks run on hardware via bench.py and the verify recipe.
Reference parity bands as in tests/test_samplers.py.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="fused Pallas kernel needs a real TPU (interpret-mode PRNG is stubbed)",
)


def test_fused_glmcmc_posterior():
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.samplers.glmcmc_fused import run_glmcmc_fused

    prob = MixtureProblem(0.05)
    res = run_glmcmc_fused(prob, jax.random.PRNGKey(0), 2049, jnp.zeros(2),
                           num_chains=1024, steps_per_call=256,
                           block_chains=512)
    assert res.thetas.shape == (1024, 2049, 2)
    ch = res.thetas[:, 256:, :].reshape(-1, 2).astype(np.float64)
    absmean = np.abs(ch).mean(0)
    var = ch.var(0)
    assert np.all(absmean > 1.3) and np.all(absmean < 1.6), absmean
    assert np.all(var > 1.8) and np.all(var < 2.4), var
    # move-type accounting: ~90% of steps global, acceptance ~1%
    rates = res.acceptance_rates()
    gf_measured = np.asarray(res.counts.global_attempts).mean() / 2048
    assert 0.85 < gf_measured < 0.95, gf_measured
    assert 0.003 < float(rates["overall"].mean()) < 0.05


def test_fused_driver_packed_auto():
    """kernel='auto' picks the packed layout when num_chains allows it and
    produces the same posterior as the unpacked driver."""
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.samplers.glmcmc_fused import run_glmcmc_fused

    prob = MixtureProblem(0.05)
    res = run_glmcmc_fused(prob, jax.random.PRNGKey(4), 1025, jnp.zeros(2),
                           num_chains=2048, steps_per_call=256,
                           block_chains=512)  # 2048 % (4*512) == 0 -> packed
    assert res.thetas.shape == (2048, 1025, 2)
    ch = res.thetas[:, 256:, :].reshape(-1, 2).astype(np.float64)
    absmean = np.abs(ch).mean(0)
    assert np.all(absmean > 1.3) and np.all(absmean < 1.6), absmean
    gf_measured = np.asarray(res.counts.global_attempts).mean() / 1024
    assert 0.85 < gf_measured < 0.95, gf_measured


def test_runner_fused_methods():
    """MCMCRunner method='fused' for GLMCMC and GLMALA writes reference-
    format CSVs and recovers the posterior."""
    import jax.numpy as jnp
    import os
    import tempfile
    from glabc_tpu import DiagGaussian, MCMCRunner, MixtureProblem

    prob = MixtureProblem(0.05)
    ip = DiagGaussian.create(2, 0.0, 0.0)
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
    with tempfile.TemporaryDirectory() as td:
        runner = MCMCRunner(prob, output_dir=td, num_chains=2048,
                            verbose=False)
        ch = runner.run_glmcmc(513, jnp.zeros(2), None, 0.9, lp, ip, 5,
                               method="fused")
        assert ch.shape == (2048, 513, 2)
        csv = np.loadtxt(os.path.join(td, "glmcmc_results.csv"),
                         delimiter=",")
        assert csv.shape == (513, 2)
        np.testing.assert_allclose(csv, ch[0], rtol=1e-6, atol=1e-7)
        ch2 = runner.run_glmala(129, jnp.zeros(2), None, 0.8, ip, 5, 0.3,
                                50, method="fused", steps_per_call=64)
        assert ch2.shape == (2048, 129, 2)
        a = np.abs(ch[:, 128:, :].reshape(-1, 2)).mean(0)
        assert np.all(a > 1.3) and np.all(a < 1.6), a


def test_fused_driver_mesh_single_device():
    """run_glmcmc_fused(mesh=) on a 1-device TPU mesh: the shard_map path
    must produce the same posterior as the direct path."""
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.parallel import make_mesh
    from glabc_tpu.samplers.glmcmc_fused import run_glmcmc_fused

    prob = MixtureProblem(0.05)
    res = run_glmcmc_fused(prob, jax.random.PRNGKey(5), 1025, jnp.zeros(2),
                           num_chains=2048, steps_per_call=256,
                           block_chains=512, kernel="packed",
                           mesh=make_mesh(1))
    ch = res.thetas[:, 256:, :].reshape(-1, 2).astype(np.float64)
    absmean = np.abs(ch).mean(0)
    assert np.all(absmean > 1.3) and np.all(absmean < 1.6), absmean


def test_global_mcmc_fused_posterior():
    """Fused GlobalMCMC (independence-MH global move, algorithm='global'),
    packed and unpacked kernels: posterior bands as TestGlobalMCMC."""
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.samplers.glmcmc_fused import run_global_mcmc_fused

    prob = MixtureProblem(0.05)
    for kern in ("packed", "unpacked"):
        res = run_global_mcmc_fused(prob, jax.random.PRNGKey(2), 1025,
                                    jnp.zeros(2), gp_loc=0.0, gp_scale=1.0,
                                    lp_scale=0.35, global_frequency=0.5,
                                    num_chains=2048, steps_per_call=256,
                                    block_chains=512, kernel=kern)
        ch = res.thetas[:, 256:, :].reshape(-1, 2).astype(np.float64)
        absmean = np.abs(ch).mean(0)
        assert np.all(absmean > 1.25) and np.all(absmean < 1.65), (kern,
                                                                   absmean)
        # ~half the steps attempt the global move
        gf = np.asarray(res.counts.global_attempts).mean() / 1024
        assert 0.4 < gf < 0.6, (kern, gf)


def test_fused_checkpoint_resume_bitwise(tmp_path):
    """Packed-driver checkpoint/resume: the interrupted-and-resumed run
    reproduces the uninterrupted run bitwise (same seed => same stream)."""
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.samplers.glmcmc_fused import run_glmcmc_fused

    prob = MixtureProblem(0.05)
    kw = dict(num_chains=2048, steps_per_call=64, block_chains=512,
              kernel="packed", seed=99)
    full = run_glmcmc_fused(prob, jax.random.PRNGKey(5), 257, jnp.zeros(2),
                            **kw)

    ck = str(tmp_path / "fused.npz")
    part = run_glmcmc_fused(prob, jax.random.PRNGKey(5), 129, jnp.zeros(2),
                            checkpoint_path=ck, **kw)
    resumed = run_glmcmc_fused(prob, jax.random.PRNGKey(5), 257,
                               jnp.zeros(2), checkpoint_path=ck,
                               resume=True, **kw)
    np.testing.assert_array_equal(
        np.concatenate([part.thetas, resumed.thetas], axis=1), full.thetas)
    np.testing.assert_array_equal(np.asarray(full.final_carry[0]),
                                  np.asarray(resumed.final_carry[0]))
    np.testing.assert_array_equal(
        np.asarray(full.counts.global_attempts),
        np.asarray(resumed.counts.global_attempts))


def test_glmala_checkpoint_resume_bitwise(tmp_path):
    """GLMALA fused driver resume: bitwise, including the host-side
    shared-coin stream replay."""
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.samplers.glmala_fused import run_glmala_fused

    prob = MixtureProblem(0.05)
    kw = dict(num_chains=2048, num_grad=5, steps_per_call=16,
              block_chains=512, coin_mode="shared", seed=77)
    full = run_glmala_fused(prob, jax.random.PRNGKey(6), 65, jnp.zeros(2),
                            **kw)
    ck = str(tmp_path / "glmala.npz")
    part = run_glmala_fused(prob, jax.random.PRNGKey(6), 33, jnp.zeros(2),
                            checkpoint_path=ck, **kw)
    resumed = run_glmala_fused(prob, jax.random.PRNGKey(6), 65,
                               jnp.zeros(2), checkpoint_path=ck,
                               resume=True, **kw)
    np.testing.assert_array_equal(
        np.concatenate([part.thetas, resumed.thetas], axis=1), full.thetas)
    np.testing.assert_array_equal(np.asarray(full.final_carry[0]),
                                  np.asarray(resumed.final_carry[0]))


def test_packed_glmcmc_high_dim():
    """d=8 (pack=1) packed kernel on HighDimMixtureProblem: posterior
    matches the scan path run with the same proposals."""
    import jax.numpy as jnp
    from glabc_tpu import DiagGaussian, HighDimMixtureProblem
    from glabc_tpu.samplers import run_glmcmc
    from glabc_tpu.samplers.glmcmc_fused import run_glmcmc_fused

    prob = HighDimMixtureProblem(dim=8, epsilon=0.5)
    res_f = run_glmcmc_fused(prob, jax.random.PRNGKey(7), 2049,
                             jnp.zeros(8), num_chains=1024,
                             steps_per_call=256, block_chains=512,
                             kernel="packed")
    ch_f = res_f.thetas[:, 512:, :].reshape(-1, 8).astype(np.float64)

    ip = DiagGaussian.create(8, 0.0, 0.0)
    lp = DiagGaussian.create(8, 0.0, float(jnp.log(0.35)))
    res_s = run_glmcmc(prob, jax.random.PRNGKey(8), 2049, jnp.zeros(8),
                       ip, lp, 0.9, 5, num_chains=64, segment_size=2049)
    ch_s = res_s.thetas[:, 512:, :].reshape(-1, 8).astype(np.float64)

    am_f, am_s = np.abs(ch_f).mean(0), np.abs(ch_s).mean(0)
    assert np.all(np.abs(am_f - am_s) < 0.15), (am_f, am_s)
    assert np.all(np.abs(ch_f.var(0) - ch_s.var(0)) < 0.3), (
        ch_f.var(0), ch_s.var(0))


def test_generic_program_mixture_posterior():
    """The generic fused kernel running the Mixture tile program must
    reproduce the specialized kernels' posterior (same bands)."""
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.ops.pallas.generic_kernel import mixture_tile_program
    from glabc_tpu.samplers.fused_program import run_fused_program

    prob = MixtureProblem(0.05)
    prog = mixture_tile_program(prob, ip_loc=0.0, ip_scale=1.0,
                                lp_scale=0.35)
    res = run_fused_program(prob, prog, jax.random.PRNGKey(11), 2049,
                            jnp.zeros(2), global_frequency=0.9,
                            batch_size=5, num_chains=1024,
                            steps_per_call=256, block_chains=512)
    ch = res.thetas[:, 256:, :].reshape(-1, 2).astype(np.float64)
    absmean = np.abs(ch).mean(0)
    var = ch.var(0)
    assert np.all(absmean > 1.3) and np.all(absmean < 1.6), absmean
    assert np.all(var > 1.8) and np.all(var < 2.4), var
    gf = np.asarray(res.counts.global_attempts).mean() / 2048
    assert 0.85 < gf < 0.95, gf


def test_generic_program_ma2_matches_scan():
    """MA(2) through the generic fused kernel vs the scan path: same
    posterior moments (the two implementations share only the problem
    definition, so agreement validates the in-kernel streaming simulator,
    the triangle-support masking, and the box-uniform iSIR proposal)."""
    import jax.numpy as jnp
    from glabc_tpu import MA2Problem, DiagGaussian, Uniform
    from glabc_tpu.samplers import run_glmcmc
    from glabc_tpu.samplers.fused_program import run_fused_program

    prob = MA2Problem()  # T=100, eps=0.2, theta_true=(0.6, 0.2)
    theta0 = jnp.zeros(2)

    res_f = run_fused_program(prob, prob.tile_program(lp_scale=0.1),
                              jax.random.PRNGKey(21), 2049, theta0,
                              global_frequency=0.8, batch_size=5,
                              num_chains=1024, steps_per_call=256,
                              block_chains=512)
    ch_f = res_f.thetas[:, 512:, :].reshape(-1, 2).astype(np.float64)

    ip = Uniform(jnp.array([-2.0, -1.0], jnp.float32),
                 jnp.array([2.0, 1.0], jnp.float32))
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.1)))
    res_s = run_glmcmc(prob, jax.random.PRNGKey(22), 2049, theta0, ip, lp,
                       0.8, 5, num_chains=64, segment_size=2049)
    ch_s = res_s.thetas[:, 512:, :].reshape(-1, 2).astype(np.float64)

    mf, ms = ch_f.mean(0), ch_s.mean(0)
    assert np.all(np.abs(mf - ms) < 0.1), (mf, ms)
    assert np.all(np.abs(ch_f.std(0) - ch_s.std(0)) < 0.1), (
        ch_f.std(0), ch_s.std(0))
    # chains stay inside the triangular prior support
    assert np.all(ch_f[:, 1] < 1.0 + 1e-6)
    assert np.all(ch_f[:, 1] > np.abs(ch_f[:, 0]) - 1.0 - 1e-6)


def test_glmala_driver_mesh_single_device():
    """run_glmala_fused(mesh=) on a 1-device TPU mesh: the shard_map path
    must reproduce the direct path's posterior."""
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.parallel import make_mesh
    from glabc_tpu.samplers.glmala_fused import run_glmala_fused

    prob = MixtureProblem(0.05)
    res = run_glmala_fused(prob, jax.random.PRNGKey(3), 513, jnp.zeros(2),
                           num_chains=2048, num_grad=20, steps_per_call=32,
                           block_chains=512, coin_mode="shared",
                           mesh=make_mesh(1))
    ch = res.thetas[:, 128:, :].reshape(-1, 2).astype(np.float64)
    absmean = np.abs(ch).mean(0)
    assert np.all(absmean > 1.2) and np.all(absmean < 1.7), absmean


def test_packed_glmcmc_posterior():
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.ops.pallas.packed_kernel import (
        PackedMixtureGLMCMC, packed_state_init, unpack_history)

    prob = MixtureProblem(0.05)
    kern = PackedMixtureGLMCMC(2, prob.y_obs, epsilon=0.05,
                               sigma=float(np.sqrt(0.05)),
                               global_frequency=0.9, batch_size=5,
                               steps_per_call=256, block_chains=512)
    theta, y, logk = packed_state_init(prob, jax.random.PRNGKey(0),
                                       jnp.zeros(2), 512, kern.pack)
    chains = []
    for i in range(6):
        theta, y, logk, hist, st = kern.run(np.int32(1 + i), theta, y, logk)
        if i >= 2:  # burn-in: 2 * 256 steps
            chains.append(unpack_history(np.asarray(hist), 2))
    ch = np.concatenate(chains, axis=1).reshape(-1, 2).astype(np.float64)
    absmean = np.abs(ch).mean(0)
    var = ch.var(0)
    assert np.all(absmean > 1.3) and np.all(absmean < 1.6), absmean
    assert np.all(var > 1.8) and np.all(var < 2.4), var


def test_fused_glmala_posterior_shared_coin():
    import jax.numpy as jnp
    from glabc_tpu import MixtureProblem
    from glabc_tpu.samplers.glmala_fused import run_glmala_fused

    prob = MixtureProblem(0.05)
    res = run_glmala_fused(prob, jax.random.PRNGKey(2), 513, jnp.zeros(2),
                           num_chains=2048, steps_per_call=64,
                           block_chains=512, num_grad=50,
                           coin_mode="shared")
    assert res.thetas.shape == (2048, 513, 2)
    ch = res.thetas[:, 128:, :].reshape(-1, 2).astype(np.float64)
    absmean = np.abs(ch).mean(0)
    assert np.all(absmean > 1.2) and np.all(absmean < 1.7), absmean
    # shared coin: per-call global fraction ~0.8
    gf_measured = np.asarray(res.counts.global_attempts).mean() / 512
    assert 0.6 < gf_measured < 0.95, gf_measured


def test_fused_glmala_per_chain_coin_matches_scan():
    import jax.numpy as jnp
    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.samplers.glmala import run_glmala
    from glabc_tpu.samplers.glmala_fused import run_glmala_fused

    prob = MixtureProblem(0.05)
    ip = DiagGaussian.create(2, 0.0, 0.0)
    fused = run_glmala_fused(prob, jax.random.PRNGKey(3), 257, jnp.zeros(2),
                             num_chains=2048, steps_per_call=64,
                             block_chains=512, num_grad=50,
                             coin_mode="per_chain")
    scan = run_glmala(prob, jax.random.PRNGKey(3), 257, jnp.zeros(2), ip,
                      0.8, 5, 0.3, 50, num_chains=32, segment_size=256)
    a = np.abs(fused.thetas[:, 64:, :].reshape(-1, 2)).mean(0)
    b = np.abs(scan.thetas[:, 64:, :].reshape(-1, 2)).mean(0)
    np.testing.assert_allclose(a, b, atol=0.15)


def test_fused_matches_scan_path_statistically():
    import jax.numpy as jnp
    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.samplers import run_glmcmc
    from glabc_tpu.samplers.glmcmc_fused import run_glmcmc_fused

    prob = MixtureProblem(0.05)
    ip = DiagGaussian.create(2, 0.0, 0.0)
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
    fused = run_glmcmc_fused(prob, jax.random.PRNGKey(1), 1025, jnp.zeros(2),
                             num_chains=512, steps_per_call=256,
                             block_chains=512)
    scan = run_glmcmc(prob, jax.random.PRNGKey(1), 1025, jnp.zeros(2), ip,
                      lp, 0.9, 5, num_chains=512, segment_size=1024)
    a = np.abs(fused.thetas[:, 256:, :].reshape(-1, 2)).mean(0)
    b = np.abs(scan.thetas[:, 256:, :].reshape(-1, 2)).mean(0)
    np.testing.assert_allclose(a, b, atol=0.1)
