"""Generic fused GLMALA (TileProgram CRN gradients): CPU plumbing tests.

Interpret mode stubs the on-chip PRNG (zeros), so these validate
shapes/tracing/seed-plumbing of the program-agnostic MALA kernel; the
statistical parity against the scan path runs TPU-gated below
(``GLABC_TPU_TESTS=1``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glabc_tpu import MA2Problem, MixtureProblem
from glabc_tpu.ops.pallas.generic_kernel import mixture_tile_program
from glabc_tpu.samplers.fused_program import run_glmala_program

KEY = jax.random.PRNGKey(0)
ON_TPU = jax.devices()[0].platform == "tpu"


@pytest.mark.parametrize("prog_name", ["mixture", "ma2"])
@pytest.mark.parametrize("coin_mode", ["shared", "per_chain"])
def test_interpret_plumbing(prog_name, coin_mode):
    if prog_name == "mixture":
        prob = MixtureProblem(0.05)
        prog = mixture_tile_program(prob, lp_scale=0.35)
    else:
        prob = MA2Problem(num_draws=16)
        prog = prob.tile_program()
    res = run_glmala_program(
        prob, prog, KEY, 7, jnp.zeros(2), num_grad=3, steps_per_call=3,
        num_chains=128, block_chains=128, seed=0, coin_mode=coin_mode,
        interpret=True)
    assert res.thetas.shape == (128, 7, 2)
    assert np.all(np.isfinite(res.thetas))
    assert int(res.counts.global_attempts[0]
               + res.counts.local_attempts[0]) == 6


def test_requires_discrepancy_and_prior_grad():
    import dataclasses

    prob = MA2Problem(num_draws=16)
    prog = dataclasses.replace(prob.tile_program(), discrepancy=None)
    with pytest.raises(AssertionError, match="discrepancy"):
        run_glmala_program(prob, prog, KEY, 5, jnp.zeros(2),
                           num_chains=128, block_chains=128,
                           interpret=True)


def test_sharded_matches_unsharded_interpret():
    from glabc_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    prob = MA2Problem(num_draws=16)
    prog = prob.tile_program()
    kw = dict(num_grad=2, steps_per_call=2, num_chains=1024,
              block_chains=128, seed=0, interpret=True)
    a = run_glmala_program(prob, prog, KEY, 5, jnp.zeros(2), **kw)
    b = run_glmala_program(prob, prog, KEY, 5, jnp.zeros(2),
                           mesh=make_mesh(8), **kw)
    np.testing.assert_array_equal(a.thetas, b.thetas)


def test_kernel_lowers_for_tpu():
    from jax import export

    from glabc_tpu.ops.pallas.generic_glmala_kernel import GenericFusedGLMALA
    from glabc_tpu.samplers.fused_program import program_state_init

    prob = MA2Problem(num_draws=16)
    prog = prob.tile_program()
    kern = GenericFusedGLMALA(prog, epsilon=prob.epsilon, num_grad=2,
                              steps_per_call=2, block_chains=128)
    theta, y, logk = program_state_init(prob, KEY, jnp.zeros(2), 128,
                                        kern.d_pad, prog.y_rows)
    export.export(jax.jit(lambda *a: kern.run(*a)), platforms=["tpu"])(
        jnp.int32(1), jnp.zeros(2, jnp.int32), theta, y, logk,
        jnp.zeros_like(theta))


@pytest.mark.skipif(
    not (ON_TPU or os.environ.get("GLABC_TPU_TESTS")),
    reason="statistical test needs real on-chip PRNG")
@pytest.mark.slow
def test_ma2_posterior_matches_scan_glmala():
    """MA(2) generic fused GLMALA vs the scan path: posterior moments and
    acceptance within Monte-Carlo error (different RNG streams)."""
    from glabc_tpu.models.distributions import Uniform
    from glabc_tpu.samplers.glmala import run_glmala

    prob = MA2Problem()
    n_ite, C = 641, 512
    res_f = run_glmala_program(
        prob, prob.tile_program(), KEY, n_ite, jnp.zeros(2),
        global_frequency=0.8, tau=0.1, num_grad=20, num_chains=C,
        block_chains=128, steps_per_call=16, seed=0)
    # the generic program's importance proposal: uniform over the box
    # [-2, 2] x [-1, 1] covering the prior triangle
    ip = Uniform(low=jnp.array([-2.0, -1.0]), high=jnp.array([2.0, 1.0]))
    res_s = run_glmala(
        prob, jax.random.PRNGKey(9), n_ite, jnp.zeros(2), ip,
        global_frequency=0.8, tau=0.1, num_grad=20, num_chains=C)
    burn = n_ite // 3
    a = np.asarray(res_f.thetas[:, burn:], np.float64).reshape(-1, 2)
    b = np.asarray(res_s.thetas[:, burn:], np.float64).reshape(-1, 2)
    np.testing.assert_allclose(a.mean(0), b.mean(0), atol=0.1)
    np.testing.assert_allclose(a.var(0), b.var(0), atol=0.1)
    acc_f = res_f.counts.local_accepts.sum() / max(
        res_f.counts.local_attempts.sum(), 1)
    acc_s = res_s.counts.local_accepts.sum() / max(
        res_s.counts.local_attempts.sum(), 1)
    assert abs(float(acc_f) - float(acc_s)) < 0.1, (acc_f, acc_s)


def test_runner_fused_tile_program_routes(tmp_path):
    from glabc_tpu import MCMCRunner

    prob = MA2Problem(num_draws=16)
    runner = MCMCRunner(prob, output_dir=str(tmp_path), num_chains=128,
                        verbose=False)
    ch = runner.run_glmala(7, jnp.zeros(2), None, 0.8, None, 5, 0.1, 2,
                           method="fused", tile_program=prob.tile_program(),
                           steps_per_call=3, block_chains=128, seed=0,
                           interpret=True)
    assert ch.shape == (128, 7, 2)
    csv = np.loadtxt(tmp_path / "glmala_results.csv", delimiter=",")
    assert csv.shape == (7, 2)
