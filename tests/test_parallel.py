"""Multi-device tests on the fake 8-device CPU mesh (SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.parallel import (
    CHAIN_AXIS,
    distributed_quantile,
    make_mesh,
    make_sharded_flow_trainer,
    shard_chains,
    sharded_sample,
)
from glabc_tpu.samplers import (
    GLMCMCConfig,
    build_glmcmc_step,
    init_chain_carry,
)
from glabc_tpu.samplers.glmcmc_nf import GLMCMCNFConfig, make_optimizer
from glabc_tpu.models.flows import CouplingFlow

PROB = MixtureProblem(0.05)
IP = DiagGaussian.create(2, 0.0, 0.0)
LP = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh()


def test_mesh_has_eight_devices(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == (CHAIN_AXIS,)


def test_sharded_sample_matches_single_device(mesh):
    """Sharding chains over the mesh must not change results: same key =>
    bitwise-identical chains (the kernel is elementwise over chains)."""
    step = build_glmcmc_step(PROB, IP, LP, GLMCMCConfig(0.9, 5))
    batched = jax.vmap(step, in_axes=(0, None))
    carry = init_chain_carry(PROB, KEY, jnp.zeros(2), num_chains=16)

    _, thetas_ref = sharded_sample(batched, carry, 200, make_mesh(1),
                                   segment_size=200)
    carry2 = init_chain_carry(PROB, KEY, jnp.zeros(2), num_chains=16)
    _, thetas_sharded = sharded_sample(batched, carry2, 200, mesh,
                                       segment_size=200)
    np.testing.assert_array_equal(thetas_ref, thetas_sharded)


def test_shard_chains_placement(mesh):
    carry = init_chain_carry(PROB, KEY, jnp.zeros(2), num_chains=16)
    sharded = shard_chains(carry, mesh)
    shard = sharded.theta.sharding
    assert shard.spec == P(CHAIN_AXIS, None)
    assert len(sharded.theta.addressable_shards) == 8


def test_distributed_quantile_matches_global(mesh):
    x = jax.random.normal(KEY, (8, 128))

    def worker(x_local):
        return distributed_quantile(x_local[0], 0.3)

    got = jax.jit(
        jax.shard_map(worker, mesh=mesh, in_specs=P(CHAIN_AXIS),
                      out_specs=P(), check_vma=False)
    )(x)
    expected = jnp.quantile(x.reshape(-1), 0.3)
    np.testing.assert_allclose(float(got), float(expected), rtol=1e-5)


def test_sharded_flow_trainer(mesh):
    cfg = GLMCMCNFConfig(batch_size=8, step_size=16, n_layers=2, hidden=16)
    optimizer = make_optimizer(cfg)
    flow = CouplingFlow.create(KEY, 2, cfg.n_layers, cfg.hidden)
    opt_state = optimizer.init(flow)
    train = make_sharded_flow_trainer(PROB, cfg, optimizer, mesh)
    new_flow, new_opt, loss = train(flow, opt_state, KEY)
    assert np.isfinite(float(loss))
    # parameters must actually move
    delta = jax.tree_util.tree_reduce(
        lambda acc, p: acc + float(jnp.sum(jnp.abs(p))),
        jax.tree_util.tree_map(lambda a, b: a - b, new_flow.stack, flow.stack),
        0.0,
    )
    assert delta > 0.0
    # and the update must be replicated (identical) across devices:
    w = new_flow.stack.w2
    assert np.all(np.isfinite(np.asarray(w)))


def test_sharded_trainer_reduces_loss_over_epochs(mesh):
    cfg = GLMCMCNFConfig(batch_size=16, step_size=32, n_layers=4, hidden=32,
                         learning_rate=5e-3)
    optimizer = make_optimizer(cfg)
    flow = CouplingFlow.create(KEY, 2, cfg.n_layers, cfg.hidden)
    opt_state = optimizer.init(flow)
    train = make_sharded_flow_trainer(PROB, cfg, optimizer, mesh)
    key = KEY
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        flow, opt_state, loss = train(flow, opt_state, k)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_run_glmcmc_with_mesh(mesh):
    """mesh= kwarg shards the carry; result identical to unsharded."""
    from glabc_tpu.samplers import run_glmcmc
    a = run_glmcmc(PROB, KEY, 201, jnp.zeros(2), IP, LP, 0.9, 5,
                   num_chains=16, segment_size=201)
    b = run_glmcmc(PROB, KEY, 201, jnp.zeros(2), IP, LP, 0.9, 5,
                   num_chains=16, segment_size=201, mesh=mesh)
    np.testing.assert_array_equal(a.thetas, b.thetas)


def test_run_glmcmc_nf_with_mesh_flow_is(mesh):
    """End-to-end sharded GLMCMC-NF: chains sharded, flow refit inside
    shard_map with pmean'd gradients."""
    from glabc_tpu.samplers.glmcmc_nf import run_glmcmc_nf
    res = run_glmcmc_nf(PROB, KEY, 61, jnp.zeros(2), LP,
                        global_frequency=0.5, batch_size=4, step_size=10,
                        train_steps=3, num_chains=16, n_layers=2, hidden=16,
                        mesh=mesh)
    assert res.thetas.shape == (16, 61, 2)
    assert np.all(np.isfinite(res.thetas))
    assert res.loss_hist.size >= 1 and np.all(np.isfinite(res.loss_hist))


def test_run_glmcmc_nf_with_mesh_chain_states(mesh):
    from glabc_tpu.samplers.glmcmc_nf import run_glmcmc_nf
    res = run_glmcmc_nf(PROB, KEY, 41, jnp.zeros(2), LP,
                        global_frequency=0.5, batch_size=4, step_size=10,
                        train_steps=2, num_chains=16, n_layers=2, hidden=16,
                        train_on="chain_states", mesh=mesh)
    assert np.all(np.isfinite(res.thetas))
    assert np.all(np.isfinite(res.loss_hist))


@pytest.mark.slow
def test_run_aglmcmc_with_mesh_shared_adaptation(mesh):
    """End-to-end sharded AGLMCMC with the shared-adaptation epoch inside
    shard_map: global epsilon quantile, distributed resampling of the KDE
    support, replicated KDE, per-device pool redraw."""
    from glabc_tpu.samplers.aglmcmc import run_aglmcmc
    res = run_aglmcmc(PROB, KEY, 81, jnp.zeros(2), LP, IP,
                      global_frequency=1.0, batch_size=4, step_size=20,
                      alpha=0.8, hat_eps_T=0.2, num_chains=16,
                      shared_adaptation=True, shared_support=64, mesh=mesh)
    assert res.thetas.shape == (16, 81, 2)
    assert np.all(np.isfinite(res.thetas))
    # annealing must have moved hat_eps off the 1e6 initial value
    assert res.hat_eps_hist is not None
    assert float(res.hat_eps_hist[-1]) < 1.0e6


@pytest.mark.slow
def test_run_aglmcmc_with_mesh_per_chain(mesh):
    """Per-chain adaptation under a mesh: elementwise over chains, no
    collectives; just verify it runs sharded and stays finite."""
    from glabc_tpu.samplers.aglmcmc import run_aglmcmc
    res = run_aglmcmc(PROB, KEY, 41, jnp.zeros(2), LP, IP,
                      global_frequency=1.0, batch_size=4, step_size=10,
                      num_chains=16, mesh=mesh)
    assert np.all(np.isfinite(res.thetas))


def test_sharded_fused_kernel_runs_interpret(mesh):
    """The packed fused kernel under shard_map on the 8-device CPU mesh
    (TPU-interpret mode; pltpu PRNG is stubbed there, so this validates the
    sharding plumbing — shapes, specs, per-device grids — not statistics,
    which the TPU-gated tests cover)."""
    from jax.sharding import NamedSharding
    from glabc_tpu.ops.pallas.packed_kernel import (
        PackedMixtureGLMCMC, packed_state_init)

    kern = PackedMixtureGLMCMC(2, PROB.y_obs, epsilon=0.05,
                               sigma=float(np.sqrt(0.05)), steps_per_call=4,
                               block_chains=128, interpret=True)
    theta, y, logk = packed_state_init(PROB, KEY, jnp.zeros(2), 1024, 4)
    sh = NamedSharding(mesh, P(None, CHAIN_AXIS))
    theta, y, logk = (jax.device_put(x, sh) for x in (theta, y, logk))
    run = kern.make_sharded_run(mesh)
    th, yy, lk, hist, st = run(jnp.int32(1), theta, y, logk)
    assert th.shape == (8, 1024) and hist.shape == (4, 8, 1024)
    assert th.sharding.spec == P(None, CHAIN_AXIS)
    assert np.all(np.isfinite(np.asarray(th)))


def test_sharded_glmala_kernel_runs_interpret(mesh):
    """The packed fused GLMALA kernel under shard_map on the 8-device CPU
    mesh (TPU-interpret mode; plumbing-only, as for the GLMCMC variant)."""
    from jax.sharding import NamedSharding
    from glabc_tpu.ops.pallas.glmala_kernel import (
        PackedMixtureGLMALA, packed_grad_init)
    from glabc_tpu.ops.pallas.packed_kernel import packed_state_init

    kern = PackedMixtureGLMALA(2, PROB.y_obs, epsilon=0.05,
                               sigma=float(np.sqrt(0.05)), num_grad=2,
                               steps_per_call=2, block_chains=128,
                               coin_mode="shared", interpret=True)
    theta, y, logk = packed_state_init(PROB, KEY, jnp.zeros(2), 1024, 4)
    grad = packed_grad_init(PROB, KEY, jnp.zeros(2), 1024, 4, 2)
    sh = NamedSharding(mesh, P(None, CHAIN_AXIS))
    theta, y, logk, grad = (jax.device_put(x, sh)
                            for x in (theta, y, logk, grad))
    run = kern.make_sharded_run(mesh)
    th, yy, lk, gr, hist, st = run(jnp.int32(1), jnp.zeros(2, jnp.int32),
                                   theta, y, logk, grad)
    assert th.shape == (8, 1024) and hist.shape == (2, 8, 1024)
    assert th.sharding.spec == P(None, CHAIN_AXIS)
    assert np.all(np.isfinite(np.asarray(th)))


def test_distributed_systematic_resample_matches_global(mesh):
    """Sharded resample == single-array systematic_resample on the same
    grid (same u0), and every device agrees on the global index vector."""
    from glabc_tpu.ops import systematic_resample
    from glabc_tpu.parallel import distributed_systematic_resample

    w = jax.random.uniform(KEY, (8, 32))  # 8 device shards of 32
    n_per = 16

    def worker(w_local):
        return distributed_systematic_resample(KEY, w_local[0], n_per)

    got = jax.jit(
        jax.shard_map(worker, mesh=mesh, in_specs=P(CHAIN_AXIS),
                      out_specs=P(CHAIN_AXIS), check_vma=False)
    )(w)  # (8*n_per,) concatenated per-device slices = global index vector
    wg = w.reshape(-1)
    expected = systematic_resample(KEY, wg / wg.sum(), 8 * n_per)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(expected))
