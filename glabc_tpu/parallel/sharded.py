"""Sharded (multi-chip / multi-host) execution paths.

The chain axis is sharded over the mesh (``mesh.py``).  Three kinds of code
run here:

1. :func:`sharded_sample` — run any batched transition kernel with the carry
   sharded over the mesh.  The kernels are elementwise over chains, so XLA
   partitions the scan without inserting collectives; this is the weak-scaling
   path (C chains/device x N devices).
2. :func:`make_sharded_flow_trainer` — data-parallel GLMCMC-NF proposal
   refit: each device draws and weighs its own shard of the training pool,
   computes flow gradients, and the gradients are ``pmean``-ed over ICI so
   every device applies the identical Adam update (the distributed analogue
   of ``GLMCMC_NFs.py:114-124``).
3. :func:`distributed_quantile` / :func:`sharded_hat_eps_update` — the
   AGLMCMC epsilon-annealing quantile (``AGLMCMC.py:174-196``) computed over
   the *global* pool via an ``all_gather`` of per-device discrepancy shards,
   for shared (cross-chain) adaptation.

All of these are exercised on a fake 8-device CPU mesh in CI
(``tests/test_parallel.py``) per SURVEY §4.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.resampling import stable_partition_indices, systematic_resample
from .mesh import CHAIN_AXIS, shard_chains

__all__ = [
    "sharded_sample",
    "make_sharded_flow_trainer",
    "make_sharded_chain_state_trainer",
    "make_sharded_shared_epoch",
    "distributed_quantile",
    "distributed_systematic_resample",
    "sharded_hat_eps_update",
]


def sharded_sample(batched_step: Callable, carry, num_steps: int, mesh,
                   segment_size: int = 10_000,
                   on_segment: Optional[Callable] = None):
    """Run a chain-batched ``step`` with the carry sharded over ``mesh``.

    ``carry`` leaves must have a leading chain axis divisible by the mesh
    size.  Returns ``(final_carry, thetas (C, T, d) on host)``.
    """
    carry = shard_chains(carry, mesh)

    @functools.partial(jax.jit, static_argnames=("length",))
    def seg(c, length):
        return jax.lax.scan(batched_step, c, None, length=length)

    blocks = []
    done = 0
    while done < num_steps:
        take = min(segment_size, num_steps - done)
        carry, outs = seg(carry, take)
        block = np.moveaxis(np.asarray(outs.theta), 0, 1)
        if on_segment is not None:
            on_segment(block, done)
        blocks.append(block)
        done += take
    thetas = np.concatenate(blocks, axis=1) if blocks else None
    return carry, thetas


def make_sharded_flow_trainer(problem, cfg, optimizer, mesh):
    """Data-parallel version of
    :func:`glabc_tpu.samplers.glmcmc_nf.make_flow_trainer`.

    Each device draws ``pool_n / n_devices`` flow proposals, simulates and
    weighs them locally, systematically resamples its local shard, computes
    the forward-KLD gradient on the shard, and gradients are averaged with
    ``pmean`` over the mesh (ICI).  The flow and optimizer state stay
    replicated; updates are bitwise identical across devices.

    Returns ``train(flow, opt_state, key) -> (flow, opt_state, loss)``.
    """
    n_dev = mesh.devices.size
    pool_n = cfg.batch_size * cfg.step_size
    local_n = max(1, pool_n // n_dev)

    def worker(flow, opt_state, keys):
        key = keys[0]
        k_sample, k_sim, k_res = jax.random.split(key, 3)
        pool, log_q = flow.forward(k_sample, local_n)
        nan_row = jnp.any(jnp.isnan(pool), axis=-1)
        pool_safe = jnp.where(nan_row[:, None], 0.0, pool)
        x = problem.simulate(k_sim, pool_safe)
        log_w = (
            problem.prior_log_prob(pool)
            + problem.kernel_log_prob(problem.discrepancy(x))
            - log_q
        )
        w = jnp.exp(log_w)
        w = jnp.where(nan_row | jnp.isnan(w), 0.0, w)
        w = w / jnp.sum(w)
        idx = systematic_resample(k_res, w, local_n)
        train_t = jax.lax.stop_gradient(pool_safe[idx])

        loss, grads = jax.value_and_grad(lambda f: f.forward_kld(train_t))(flow)
        # combine across devices over ICI
        loss = jax.lax.pmean(loss, CHAIN_AXIS)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, CHAIN_AXIS), grads
        )
        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, jnp.nan_to_num(g), 0.0), grads
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, flow)
        new_flow = optax.apply_updates(flow, updates)
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda u, v: jnp.where(good, u, v), a, b
        )
        return sel(new_flow, flow), sel(new_opt_state, opt_state), loss

    # check_vma=False: the outputs are replicated by construction (grads and
    # loss are pmean'd before the update), which the varying-axis checker
    # cannot infer through optax's update.
    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P(CHAIN_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.jit
    def train(flow, opt_state, key):
        keys = jax.random.split(key, n_dev)
        return sharded(flow, opt_state, keys)

    return train


def make_sharded_chain_state_trainer(optimizer, mesh):
    """Data-parallel version of
    :func:`glabc_tpu.samplers.glmcmc_nf.make_chain_state_trainer`: each
    device computes the forward-KLD gradient on ITS shard of the pooled
    chain states (the chain axis is sharded over the mesh), gradients are
    ``pmean``-ed over ICI, and every device applies the identical Adam
    update.  Returns ``train(flow, opt_state, states) -> (flow, opt_state,
    loss)`` with ``states (C, d)`` chain-sharded."""

    def worker(flow, opt_state, states_local):
        train_t = jax.lax.stop_gradient(states_local)
        loss, grads = jax.value_and_grad(
            lambda f: f.forward_kld(train_t)
        )(flow)
        loss = jax.lax.pmean(loss, CHAIN_AXIS)
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.pmean(g, CHAIN_AXIS), grads
        )
        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, jnp.nan_to_num(g), 0.0), grads
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, flow)
        new_flow = optax.apply_updates(flow, updates)
        sel = lambda a, b: jax.tree_util.tree_map(
            lambda u, v: jnp.where(good, u, v), a, b
        )
        return sel(new_flow, flow), sel(new_opt_state, opt_state), loss

    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), P(), P(CHAIN_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_shared_epoch(problem, cfg, shared_support: int, mesh):
    """Sharded AGLMCMC shared-adaptation epoch
    (:func:`glabc_tpu.samplers.aglmcmc._shared_epoch_update` computed with
    collectives instead of a host gather):

    * epsilon annealing: global count + :func:`distributed_quantile` over
      every device's pool discrepancies (reference rule ``AGLMCMC.py:174-196``
      over the union of pools);
    * training weights computed locally, normalized by a global ``psum``;
    * the shared KDE support is drawn by
      :func:`distributed_systematic_resample` (every device keeps its slice
      of the same systematic grid) and ``all_gather``-ed so all devices fit
      the IDENTICAL ``shared_support``-point KDE;
    * each device redraws its own chains' pools from the shared KDE.

    Returns ``epoch(key, pools, hat_eps) -> (new_pools, kde, new_hat_eps)``
    with ``pools`` chain-sharded, ``kde``/``hat_eps`` replicated — the same
    signature as the host-driven shared epoch, so ``run_aglmcmc`` swaps them
    interchangeably.
    """
    from ..models.kde import KernelDensity
    from ..samplers.aglmcmc import _pool_from_proposals, _PRIOR_CUTOFF

    n_dev = mesh.devices.size
    assert shared_support % n_dev == 0, (
        "shared_support must divide by the mesh size")
    per_dev = shared_support // n_dev

    def worker(key, pools_local, hat_eps):
        d = pools_local.theta.shape[-1]
        P_pool = pools_local.theta.shape[1]
        my = jax.lax.axis_index(CHAIN_AXIS)
        k_res, k_loc = jax.random.split(key)
        k_loc = jax.random.fold_in(k_loc, my)
        k_sample, _ = jax.random.split(k_loc)

        dis_local = pools_local.dis.reshape(-1)
        n_local = dis_local.shape[0]

        # (1) global epsilon annealing
        def anneal(eps):
            num_a = jax.lax.psum(jnp.sum(dis_local < eps), CHAIN_AXIS)
            n = jax.lax.psum(n_local, CHAIN_AXIS)
            q = jnp.clip(cfg.alpha * num_a / n, 0.0, 1.0)
            return jnp.maximum(distributed_quantile(dis_local, q),
                               cfg.hat_eps_T)

        hat_eps = jnp.where(hat_eps > cfg.hat_eps_T, anneal(hat_eps),
                            hat_eps)

        # (2) local training weights at hat_eps — computed on the native
        # (C_local, P) shapes: reshaping the pooled thetas to (C*P, d)
        # forces a relayout whose lane dim pads d -> 128 on TPU (a 64x HBM
        # blowup); only 1-D weight vectors are flattened.
        train_log_w = (
            problem.prior_log_prob(pools_local.theta)
            + problem.kernel_log_prob(pools_local.dis, hat_eps)
            - pools_local.log_q
        )                                                   # (C_local, P)
        w_local = jnp.exp(train_log_w).reshape(-1)
        w_local = jnp.where(jnp.isnan(w_local), 0.0, w_local)

        # (3) shared KDE support by distributed systematic resampling:
        # every device evaluates the FULL common grid (replicated=True,
        # bitwise-identical selection), gathers the rows it owns from its
        # local 3-D pool by unraveled index, and a psum combines them —
        # each grid slot has exactly one owner, so the sum IS the gather.
        # (No flattened theta_global: reshaping pooled thetas to (C*P, d)
        # forces a relayout whose lane dim pads d -> 128 on TPU.)
        idx_all = distributed_systematic_resample(
            k_res, w_local, shared_support, replicated=True)  # (S,) global
        owner = idx_all // n_local
        loc = idx_all % n_local
        rows = pools_local.theta[loc // P_pool, loc % P_pool]   # (S, d)
        support = jax.lax.psum(
            jnp.where((owner == my)[:, None], rows, 0.0), CHAIN_AXIS)
        kde = KernelDensity.fit(support, None, bandwidth="silverman")

        # (4) local per-chain pool redraw from the shared KDE
        def redraw(kk):
            k_s, k_x = jax.random.split(kk)
            cand = kde.sample(k_s, cfg.oversample * P_pool)
            ok = problem.prior_log_prob(cand) > _PRIOR_CUTOFF
            order = stable_partition_indices(ok)
            new_theta = cand[order[:P_pool]]
            new_log_q = kde.log_prob(new_theta)
            return _pool_from_proposals(problem, k_x, new_theta, new_log_q)

        C_local = pools_local.theta.shape[0]
        new_pools = jax.vmap(redraw)(jax.random.split(k_sample, C_local))
        return new_pools, kde, hat_eps

    pool_spec = P(CHAIN_AXIS)
    sharded = shard_map(
        worker, mesh=mesh,
        in_specs=(P(), pool_spec, P()),
        out_specs=(pool_spec, P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def distributed_quantile(x_local, q, axis_name: str = CHAIN_AXIS):
    """Quantile of the global array whose per-device shard is ``x_local``.

    all_gathers the shards over ICI and takes ``jnp.quantile`` — exact (the
    pools here are ~10^3-10^5 elements, far below the sketching threshold).
    Call inside ``shard_map``.
    """
    x_global = jax.lax.all_gather(x_local, axis_name).reshape(-1)
    return jnp.quantile(x_global, q)


def distributed_systematic_resample(key, w_local, num_per_device: int,
                                    axis_name: str = CHAIN_AXIS,
                                    replicated: bool = False):
    """Systematic resampling over a device-sharded weight vector.

    Every device holds a shard ``w_local (n_local,)`` of the global weight
    vector.  The global cumulative sum is formed by all-gathering the shards
    over ICI; the common uniform comes from the shared ``key`` so every
    device draws from the *same* systematic grid (bitwise reproducible), and
    each device keeps its own ``num_per_device`` slice of the global index
    vector.  Returned indices are global (into the gathered pool); pair with
    an all-gathered pool or convert to (device, local) coordinates with
    divmod(n_local).  Call inside ``shard_map``.

    This is the distributed analogue of the reference resampler
    (``GLMCMC_NFs.py:29-40``) for cross-chip flow-training pools.
    """
    my = jax.lax.axis_index(axis_name)
    w_global = jax.lax.all_gather(w_local, axis_name).reshape(-1)
    w_global = jnp.where(jnp.isnan(w_global) | (w_global < 0), 0.0, w_global)
    w_global = w_global / jnp.sum(w_global)
    c = jnp.cumsum(w_global)
    if replicated:
        # every device evaluates the ENTIRE grid of ``num_per_device``
        # points (identical on all devices) instead of its own slice —
        # same grid law: (u0 + slot) / N over all N slots.
        N = num_per_device
        offset = jnp.int32(0)
    else:
        n_dev = jax.lax.psum(1, axis_name)
        N = num_per_device * n_dev
        offset = my * num_per_device
    u0 = jax.random.uniform(key, (), dtype=w_global.dtype)
    u = (u0 + offset + jnp.arange(num_per_device, dtype=w_global.dtype)) / N
    idx = jnp.searchsorted(c, u, side="right")
    return jnp.clip(idx, 0, w_global.shape[0] - 1)


def sharded_hat_eps_update(problem_unused, alpha, hat_eps_T):
    """Build the *global* epsilon-annealing rule (``AGLMCMC.py:174-196``
    computed over all devices' pools): returns
    ``update(dis_local, hat_eps) -> new_hat_eps`` to call inside shard_map.
    """

    def update(dis_local, hat_eps):
        num_a = jax.lax.psum(jnp.sum(dis_local < hat_eps), CHAIN_AXIS)
        n = jax.lax.psum(dis_local.size, CHAIN_AXIS)
        q = jnp.clip(alpha * num_a / n, 0.0, 1.0)
        new_eps = distributed_quantile(dis_local, q)
        new_eps = jnp.maximum(new_eps, hat_eps_T)
        return jnp.where(hat_eps > hat_eps_T, new_eps, hat_eps)

    return update
