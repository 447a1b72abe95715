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
