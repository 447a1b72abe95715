"""Machine-check the zero-collective claim behind weak scaling.

BASELINE.md targets >=80% weak scaling; single-chip hardware cannot measure
it, so the claim rests on the transition kernels being chain-elementwise:
XLA must insert NO cross-device communication in the compiled sharded
transition (collectives appear only in adaptation epochs).  These tests
compile the sharded scan transition and the sharded fused Pallas kernel on
the virtual 8-device mesh and grep the optimized HLO for collective ops —
turning the prose claim (PARITY_RESULTS.md "Weak scaling") into a test.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.parallel import make_mesh, shard_chains
from glabc_tpu.samplers import GLMCMCConfig, build_glmcmc_step, init_chain_carry

_COLLECTIVE = re.compile(
    r"all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all",
    re.IGNORECASE,
)

PROB = MixtureProblem(0.05)
IP = DiagGaussian.create(2, 0.0, 0.0)
LP = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))


def _collectives_in(compiled) -> list:
    return sorted(set(_COLLECTIVE.findall(compiled.as_text())))


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (conftest)")
    return make_mesh(8)


def test_checker_detects_collectives(mesh):
    """Negative control: the grep must actually see a psum's all-reduce."""
    from jax.sharding import PartitionSpec as P

    def f(x):
        return jax.lax.psum(x, "chains")

    sharded = jax.shard_map(f, mesh=mesh, in_specs=P("chains"), out_specs=P())
    compiled = jax.jit(sharded).lower(jnp.zeros(8)).compile()
    assert _collectives_in(compiled), "checker failed to see an all-reduce"


def test_sharded_scan_transition_has_zero_collectives(mesh):
    """The chain-sharded GLMCMC scan segment must compile with no
    cross-device communication (chains are independent; reference semantics
    per chain, SURVEY §2d)."""
    step = build_glmcmc_step(PROB, IP, LP, GLMCMCConfig(0.9, 5))
    batched = jax.vmap(step, in_axes=(0, None))
    carry = init_chain_carry(PROB, jax.random.PRNGKey(0), jnp.zeros(2),
                             num_chains=64)
    carry = shard_chains(carry, mesh)

    def seg(c):
        return jax.lax.scan(batched, c, None, length=8)

    compiled = jax.jit(seg).lower(carry).compile()
    assert not _collectives_in(compiled), (
        f"sharded transition compiled with collectives: "
        f"{_collectives_in(compiled)}")


def test_sharded_fused_kernel_has_zero_collectives(mesh):
    """The shard_map'd packed Pallas kernel (per-device pallas_call) must
    likewise compile collective-free (interpret mode on CPU; the lowered
    partitioning is identical)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glabc_tpu.ops.pallas.packed_kernel import (PackedMixtureGLMCMC,
                                                    packed_state_init)
    from glabc_tpu.parallel.mesh import CHAIN_AXIS

    kern = PackedMixtureGLMCMC(
        2, PROB.y_obs, epsilon=PROB.epsilon, sigma=PROB._noise_std,
        global_frequency=0.9, batch_size=5, steps_per_call=2,
        block_chains=128, collect_history=True, interpret=True,
    )
    theta, y, logk = packed_state_init(PROB, jax.random.PRNGKey(0),
                                       jnp.zeros(2), num_cols=1024, pack=4)
    sh = NamedSharding(mesh, P(None, CHAIN_AXIS))
    theta, y, logk = (jax.device_put(x, sh) for x in (theta, y, logk))
    run = kern.make_sharded_run(mesh)
    compiled = run.lower(jnp.int32(1), theta, y, logk).compile()
    assert not _collectives_in(compiled), (
        f"sharded fused kernel compiled with collectives: "
        f"{_collectives_in(compiled)}")


def test_sharded_pool_isir_kernel_has_zero_collectives(mesh):
    """The shard_map'd pool-iSIR kernel (fused AGLMCMC / NF transition loop)
    must compile collective-free: state rows and per-chain pools are both
    chain-sharded, and the kernel is pure per-chain data selection."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glabc_tpu.ops.pallas.pool_isir_kernel import (
        PoolISIR, pack_pool_logw, pack_pool_theta)
    from glabc_tpu.parallel.mesh import CHAIN_AXIS

    d, B, T, C = 2, 3, 4, 1024
    kern = PoolISIR(d, batch_size=B, steps_per_call=T, block_chains=128,
                    collect_history=True, interpret=True)
    pt = pack_pool_theta(jnp.zeros((C, T * B, d)), T, B, 8)
    pw = pack_pool_logw(jnp.zeros((C, T * B)), T, B)
    th = jnp.zeros((8, C))
    lw = jnp.zeros((1, C))
    row = NamedSharding(mesh, P(None, CHAIN_AXIS))
    pt = jax.device_put(pt, NamedSharding(mesh, P(None, None, None, CHAIN_AXIS)))
    pw = jax.device_put(pw, NamedSharding(mesh, P(None, None, CHAIN_AXIS)))
    th, lw = jax.device_put(th, row), jax.device_put(lw, row)
    run = kern.make_sharded_run(mesh)
    compiled = run.lower(jnp.int32(1), pt, pw, th, lw).compile()
    assert not _collectives_in(compiled), (
        f"sharded pool-iSIR kernel compiled with collectives: "
        f"{_collectives_in(compiled)}")


def test_sharded_pool_isir_mixed_kernel_has_zero_collectives(mesh):
    """Same property for the gf<1 mixed kernel: the resident shared-KDE
    proposal is replicated, everything else is chain-sharded, and the
    per-chain coin / local move / in-kernel density are chain-elementwise."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from glabc_tpu.models.kde import KernelDensity
    from glabc_tpu.ops.pallas.pool_isir_kernel import (
        pack_pool_logw, pack_pool_theta)
    from glabc_tpu.ops.pallas.pool_isir_mixed_kernel import (
        PoolISIRMixed, resident_from_kde)
    from glabc_tpu.parallel.mesh import CHAIN_AXIS

    d, B, T, C = 2, 3, 4, 1024
    kern = PoolISIRMixed(d, [1.5, 1.5], epsilon=0.05, sigma=0.22,
                         global_frequency=0.5, batch_size=B,
                         steps_per_call=T, block_chains=128, n_support=32,
                         support_chunk=32, collect_history=True,
                         interpret=True)
    kde = KernelDensity.fit(jnp.zeros((32, d)) + jnp.arange(32)[:, None])
    resident = resident_from_kde(kde, 8, kern.n_pad)
    pt = pack_pool_theta(jnp.zeros((C, T * B, d)), T, B, 8)
    pw = pack_pool_logw(jnp.zeros((C, T * B)), T, B)
    th = jnp.zeros((8, C))
    lk = jnp.zeros((1, C))
    row = NamedSharding(mesh, P(None, CHAIN_AXIS))
    pool4 = NamedSharding(mesh, P(None, None, None, CHAIN_AXIS))
    pool3 = NamedSharding(mesh, P(None, None, CHAIN_AXIS))
    pt = jax.device_put(pt, pool4)
    pw = jax.device_put(pw, pool3)
    th, lk = jax.device_put(th, row), jax.device_put(lk, row)
    run = kern.make_sharded_run(mesh)
    compiled = run.lower(jnp.int32(1), resident, pt, pt, pw, pw,
                         th, th, lk).compile()
    assert not _collectives_in(compiled), (
        f"sharded pool-iSIR-mixed kernel compiled with collectives: "
        f"{_collectives_in(compiled)}")


def test_adaptation_epoch_does_use_collectives(mesh):
    """Sanity: the sharded adaptation epoch IS the place collectives live
    (pooled refits / global quantiles) — assert they are present there, so
    the zero-collective transition claim is not vacuous."""
    from jax.sharding import PartitionSpec as P

    from glabc_tpu.parallel.sharded import distributed_quantile

    sharded = jax.shard_map(
        lambda x: distributed_quantile(x, 0.5),
        mesh=mesh, in_specs=P("chains"), out_specs=P(),
        check_vma=False,
    )
    compiled = jax.jit(sharded).lower(jnp.arange(64.0)).compile()
    assert _collectives_in(compiled)
