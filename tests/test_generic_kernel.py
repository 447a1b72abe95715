"""Generic fused-kernel builder: CPU (TPU-interpret) plumbing tests.

Interpret mode stubs ``pltpu.prng_random_bits`` to zeros, so these validate
tracing/shapes/layout of user tile programs through the generic kernel —
statistics are covered by the TPU-gated tests in ``test_fused_kernel.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import MA2Problem, MixtureProblem
from glabc_tpu.ops.pallas.generic_kernel import (
    GenericFusedGLMCMC,
    TileLib,
    mixture_tile_program,
)
from glabc_tpu.samplers.fused_program import (
    program_state_init,
    run_fused_program,
)

PROB = MixtureProblem(0.05)
KEY = jax.random.PRNGKey(0)


def test_tilelib_row_helpers():
    """Row extraction/building/reduction helpers on plain arrays."""
    tl = TileLib(8, 128)
    x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    np.testing.assert_allclose(tl.row(x, 3), x[3:4])
    np.testing.assert_allclose(tl.rowsum(x, 2), x[:2].sum(0, keepdims=True))
    built = tl.from_rows([x[5:6], x[6:7]])
    np.testing.assert_allclose(built[0], x[5])
    np.testing.assert_allclose(built[1], x[6])
    assert float(jnp.abs(built[2:]).max()) == 0.0
    col = tl.const_col([1.5, -2.0])
    assert col.shape == (8, 1)
    assert float(col[0, 0]) == 1.5 and float(col[1, 0]) == -2.0
    assert float(col[2, 0]) == 0.0


def _run_program(problem, program, algorithm="glmcmc"):
    kern = GenericFusedGLMCMC(program, steps_per_call=2, block_chains=128,
                              batch_size=2, interpret=True,
                              algorithm=algorithm)
    theta, y, logk = program_state_init(problem, KEY, jnp.zeros(2), 256,
                                        kern.d_pad, program.y_rows)
    return kern.run(jnp.int32(3), theta, y, logk)


def test_generic_mixture_program_interpret():
    prog = mixture_tile_program(PROB, lp_scale=0.35)
    th, y, logk, hist, st = _run_program(PROB, prog)
    assert th.shape == (8, 256) and hist.shape == (2, 8, 256)
    assert np.all(np.isfinite(np.asarray(th)))
    assert np.all(np.isfinite(np.asarray(logk)))


def test_generic_ma2_program_interpret():
    prob = MA2Problem(num_draws=16)
    th, y, logk, hist, st = _run_program(prob, prob.tile_program())
    assert th.shape == (8, 256)
    assert np.all(np.isfinite(np.asarray(th)))
    # rows beyond theta_dim stay zero
    assert float(np.abs(np.asarray(th)[2:]).max()) == 0.0


def test_generic_global_algorithm_interpret():
    prog = mixture_tile_program(PROB)
    th, y, logk, hist, st = _run_program(PROB, prog, algorithm="global")
    assert th.shape == (8, 256)
    assert np.all(np.isfinite(np.asarray(th)))


def test_run_fused_program_driver_interpret():
    """Driver contract: history length, initial state at index 0, counts."""
    prob = MA2Problem(num_draws=16)
    res = run_fused_program(prob, prob.tile_program(), KEY, 5,
                            jnp.zeros(2), num_chains=256, steps_per_call=2,
                            block_chains=128, batch_size=2, interpret=True)
    assert res.thetas.shape == (256, 5, 2)
    np.testing.assert_allclose(res.thetas[:, 0, :], 0.0)
    total = (np.asarray(res.counts.global_attempts)
             + np.asarray(res.counts.local_attempts))
    np.testing.assert_array_equal(total, 4)


def test_ma2_problem_scan_path():
    """MA2Problem drives the ordinary scan samplers too (CPU): chains stay
    inside the triangular support and summaries are finite."""
    from glabc_tpu import DiagGaussian, Uniform
    from glabc_tpu.samplers import run_glmcmc

    prob = MA2Problem(num_draws=32)
    ip = Uniform(jnp.array([-2.0, -1.0], jnp.float32),
                 jnp.array([2.0, 1.0], jnp.float32))
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.1)))
    res = run_glmcmc(prob, KEY, 200, jnp.zeros(2), ip, lp, 0.8, 5,
                     num_chains=8, segment_size=200)
    ch = np.asarray(res.thetas).reshape(-1, 2)
    assert np.all(np.isfinite(ch))
    assert np.all(ch[:, 1] < 1.0 + 1e-6)
    assert np.all(ch[:, 1] > np.abs(ch[:, 0]) - 1.0 - 1e-6)


def test_run_fused_program_checkpoint_resume(tmp_path):
    """Interrupted-and-resumed run reproduces the uninterrupted one
    (interpret mode: deterministic, validates state/counter/seed replay)."""
    prob = MA2Problem(num_draws=16)
    prog = prob.tile_program()
    kw = dict(num_chains=256, steps_per_call=2, block_chains=128,
              batch_size=2, interpret=True, seed=123)
    full = run_fused_program(prob, prog, KEY, 9, jnp.zeros(2), **kw)

    ck = str(tmp_path / "fused.npz")
    part = run_fused_program(prob, prog, KEY, 5, jnp.zeros(2),
                             checkpoint_path=ck, **kw)
    resumed = run_fused_program(prob, prog, KEY, 9, jnp.zeros(2),
                                checkpoint_path=ck, resume=True, **kw)
    np.testing.assert_array_equal(
        np.concatenate([part.thetas, resumed.thetas], axis=1),
        full.thetas)
    # counters are restored with the carry: the resumed result reports
    # cumulative whole-run counts
    np.testing.assert_array_equal(
        np.asarray(full.counts.global_attempts),
        np.asarray(resumed.counts.global_attempts))
    np.testing.assert_array_equal(np.asarray(full.final_carry[0]),
                                  np.asarray(resumed.final_carry[0]))
