"""Chip-less Mosaic lowering checks for every Pallas kernel.

Interpret-mode tests cannot catch Mosaic-unsupported primitives (e.g. an
in-kernel ``.at[].set`` lowering to ``scatter``, or a ``uint32 -> f32``
cast): they pass on CPU and only fail at compile time on hardware — that is
exactly how the flow kernel shipped broken in round 3.  ``jax.export`` with
``platforms=['tpu']`` runs the full StableHLO *and Mosaic* lowering
pipeline on any backend, so these tests compile every kernel for TPU on
the CPU CI host and fail fast on unsupported primitives.

(They do not execute anything — runtime semantics are covered by the
interpret-mode tests and the TPU-gated hardware tests.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export

from glabc_tpu import DiagGaussian, MixtureProblem

PROB = MixtureProblem(0.05)
KEY = jax.random.PRNGKey(0)


def _export_tpu(fn, *args):
    """Lower ``fn(*args)`` for the TPU platform (includes Mosaic)."""
    return export.export(jax.jit(fn), platforms=["tpu"])(*args)


def test_mixture_kernel_lowers_for_tpu():
    from glabc_tpu.ops.pallas.mixture_kernel import (FusedMixtureGLMCMC,
                                                     fused_state_init)
    kern = FusedMixtureGLMCMC(2, PROB.y_obs, epsilon=0.05,
                              sigma=float(np.sqrt(0.05)),
                              steps_per_call=2, block_chains=128)
    theta, y, logk = fused_state_init(PROB, KEY, jnp.zeros(2),
                                      num_chains=128)
    _export_tpu(lambda *a: kern.run(*a), jnp.int32(1), theta, y, logk)


def test_packed_kernel_lowers_for_tpu():
    from glabc_tpu.ops.pallas.packed_kernel import (PackedMixtureGLMCMC,
                                                    packed_state_init)
    kern = PackedMixtureGLMCMC(2, PROB.y_obs, epsilon=0.05,
                               sigma=float(np.sqrt(0.05)),
                               global_frequency=0.9, batch_size=5,
                               steps_per_call=2, block_chains=128)
    theta, y, logk = packed_state_init(PROB, KEY, jnp.zeros(2), 128,
                                       kern.pack)
    _export_tpu(lambda *a: kern.run(*a), jnp.int32(1), theta, y, logk)


def test_glmala_kernel_lowers_for_tpu():
    from glabc_tpu.ops.pallas.glmala_kernel import (PackedMixtureGLMALA,
                                                    packed_grad_init)
    from glabc_tpu.ops.pallas.packed_kernel import packed_state_init
    kern = PackedMixtureGLMALA(2, PROB.y_obs, epsilon=0.05,
                               sigma=float(np.sqrt(0.05)), num_grad=2,
                               steps_per_call=2, block_chains=128,
                               coin_mode="shared")
    theta, y, logk = packed_state_init(PROB, KEY, jnp.zeros(2), 128, 4)
    grad = packed_grad_init(PROB, KEY, jnp.zeros(2), 128, 4, 2)
    _export_tpu(lambda *a: kern.run(*a), jnp.int32(1),
                jnp.zeros(2, jnp.int32), theta, y, logk, grad)


@pytest.mark.parametrize("make_prog", ["mixture", "ma2"])
def test_generic_kernel_lowers_for_tpu(make_prog):
    from glabc_tpu.ops.pallas.generic_kernel import (GenericFusedGLMCMC,
                                                     ma2_tile_program,
                                                     mixture_tile_program)
    from glabc_tpu.samplers.fused_program import program_state_init
    if make_prog == "mixture":
        prob, prog = PROB, mixture_tile_program(PROB, lp_scale=0.35)
    else:
        from glabc_tpu.models.problems import MA2Problem
        prob = MA2Problem()
        prog = ma2_tile_program(prob, lp_scale=0.1)
    kern = GenericFusedGLMCMC(prog, steps_per_call=2, block_chains=128,
                              batch_size=2)
    theta, y, logk = program_state_init(prob, KEY,
                                        jnp.zeros(prob.theta_dim), 128,
                                        kern.d_pad, prog.y_rows)
    _export_tpu(lambda *a: kern.run(*a), jnp.int32(1), theta, y, logk)


def test_pool_isir_kernel_lowers_for_tpu():
    from glabc_tpu.ops.pallas.pool_isir_kernel import (PoolISIR,
                                                       pack_pool_logw,
                                                       pack_pool_theta)
    d, B, T, C = 2, 3, 4, 128
    kern = PoolISIR(d, batch_size=B, steps_per_call=T, block_chains=128)
    pt = pack_pool_theta(jnp.zeros((C, T * B, d)), T, B, 8)
    pw = pack_pool_logw(jnp.zeros((C, T * B)), T, B)
    _export_tpu(lambda *a: kern.run(*a), jnp.int32(1), pt, pw,
                jnp.zeros((8, C)), jnp.zeros((1, C)))


def test_pool_isir_mixed_kernel_lowers_for_tpu():
    from glabc_tpu.models.kde import KernelDensity
    from glabc_tpu.ops.pallas.pool_isir_kernel import (pack_pool_logw,
                                                       pack_pool_theta)
    from glabc_tpu.ops.pallas.pool_isir_mixed_kernel import (
        PoolISIRMixed, resident_from_kde)
    d, B, T, C = 2, 3, 4, 128
    kern = PoolISIRMixed(d, [1.5, 1.5], epsilon=0.05, sigma=0.22,
                         global_frequency=0.5, batch_size=B,
                         steps_per_call=T, block_chains=128, n_support=32,
                         support_chunk=32)
    kde = KernelDensity.fit(jnp.zeros((32, d)) + jnp.arange(32)[:, None])
    resident = resident_from_kde(kde, 8, kern.n_pad)
    pt = pack_pool_theta(jnp.zeros((C, T * B, d)), T, B, 8)
    pw = pack_pool_logw(jnp.zeros((C, T * B)), T, B)
    th = jnp.zeros((8, C))
    lk = jnp.zeros((1, C))
    _export_tpu(lambda *a: kern.run(*a), jnp.int32(1), resident, pt, pt,
                pw, pw, th, th, lk)


def test_flow_kernel_lowers_for_tpu():
    from glabc_tpu.models.flows import CouplingFlow
    from glabc_tpu.ops.pallas.flow_kernel import (FusedCouplingFlow,
                                                  pack_flow_weights)
    flow = CouplingFlow.create(KEY, 2, n_layers=4, hidden=16)
    kern = FusedCouplingFlow(2, 4, 16, block_rows=256)
    packed = pack_flow_weights(flow.stack, kern.mm)
    z = jnp.zeros((kern.d_pad, 256), jnp.float32)
    _export_tpu(lambda p, t: kern.push(p, t), packed, z)
    _export_tpu(lambda p, t: kern.pull(p, t), packed, z)
