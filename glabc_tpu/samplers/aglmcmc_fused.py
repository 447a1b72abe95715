"""High-level driver for the fused Pallas AGLMCMC sampler.

Fuses the between-epoch transition loop of AGLMCMC (reference
``AGLMCMC.py:124-164``) into the :class:`~glabc_tpu.ops.pallas.pool_isir_kernel.PoolISIR`
Pallas kernel at the canonical ``global_frequency = 1``: every transition is
an iSIR move over a precomputed pool slice, so the in-kernel step is pure
data selection (see the kernel module docstring) and the adaptation epochs —
epsilon annealing, weighted-KDE refit, oversampled pool redraw
(``AGLMCMC.py:170-249``) — run on the XLA path between ``pallas_call``s,
reusing the *same* ``_epoch_update`` as the scan path
(:func:`glabc_tpu.samplers.aglmcmc.run_aglmcmc`), which guarantees identical
annealing/refit semantics.

The driver is problem-agnostic: pool simulation and weighting happen on the
XLA path (``_pool_from_proposals``), so any :class:`ABCProblem` works — not
just the Mixture family.  For ``global_frequency < 1`` (local RW moves mixed
in) use the scan path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.pool_isir_kernel import (
    PoolISIR,
    pack_pool_logw,
    pack_pool_theta,
)
from .aglmcmc import (
    AGLMCMCConfig,
    AGLResult,
    _pool_from_proposals,
    make_epoch_fn,
)
from .base import MoveCounts
from .chain import init_chain_carry

__all__ = ["run_aglmcmc_fused"]

_SUB = 8


def run_aglmcmc_fused(problem, key, num_ite, theta0, initial_isir_proposal,
                      *, batch_size: int = 5, step_size: int = 200,
                      alpha: float = 0.8, hat_eps_T: float = 0.2,
                      oversample: int = 4, num_chains: int = 4096,
                      block_chains: int = 1024, collect_history: bool = True,
                      y0=None, seed: int | None = None, epoch_chunk: int = 0,
                      on_segment=None, interpret: bool = False,
                      mesh=None) -> AGLResult:
    """AGLMCMC via the fused pool-iSIR Pallas kernel (gf = 1).

    Segments are ``step_size`` transitions (= one pool) per ``pallas_call``;
    between segments the per-chain adaptation epoch runs on the XLA path and
    the new carry log-weight is recomputed under the fresh KDE — exactly the
    value the scan path's step recomputes each iteration.  Returns an
    :class:`AGLResult` matching the scan path's conventions (chains of
    length ``num_ite`` with the initial state at index 0, per-chain
    ``hat_eps`` trajectory, final batched KDE).

    Note: the kernel always runs ``step_size`` transitions per launch; if
    ``num_ite - 1`` is not a multiple, the recorded history is still exactly
    ``num_ite`` long but the final carry is up to ``step_size - 1``
    transitions ahead of the last recorded state and the final segment's
    move counts are scaled pro-rata (same contract as
    :func:`run_glmcmc_fused`).

    ``mesh``: a 1-D :class:`jax.sharding.Mesh` shards the chain axis —
    state rows, per-chain pools, and the adaptation epochs (which are
    chain-elementwise) all partition with zero collectives; the kernel runs
    per-device inside ``shard_map`` with tiled PRNG streams
    (:meth:`PoolISIR.make_sharded_run`).  Requires ``num_chains`` divisible
    by ``block_chains * mesh size``."""
    d = problem.theta_dim
    d_pad = max(_SUB, ((d + _SUB - 1) // _SUB) * _SUB)
    T, B, C = int(step_size), int(batch_size), int(num_chains)
    P = T * B
    cfg = AGLMCMCConfig(1.0, B, T, alpha, hat_eps_T, oversample, 0, 0)

    kern = PoolISIR(d, batch_size=B, steps_per_call=T,
                    block_chains=block_chains,
                    collect_history=collect_history, interpret=interpret)

    key = jnp.asarray(key)
    k_chain, k_pool, k_loop = jax.random.split(key, 3)
    cc = init_chain_carry(problem, k_chain, theta0, y0, C)

    @jax.jit
    def init_pools(k):
        def one(kk):
            k1, k2 = jax.random.split(kk)
            th, log_q = initial_isir_proposal.forward(k1, P)
            return _pool_from_proposals(problem, k2, th, log_q)
        return jax.vmap(one)(jax.random.split(k, C))

    pools = init_pools(k_pool)

    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import CHAIN_AXIS
        n_dev = mesh.devices.size
        assert C % (block_chains * n_dev) == 0, (
            f"num_chains must divide by {block_chains * n_dev}")
        chain_sh = NamedSharding(mesh, P(CHAIN_AXIS))
        pools = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, chain_sh), pools)
        cc = cc._replace(
            theta=jax.device_put(cc.theta, chain_sh),
            y=jax.device_put(cc.y, chain_sh),
            log_kernel=jax.device_put(cc.log_kernel, chain_sh))
        kern_run = kern.make_sharded_run(mesh)
    else:
        kern_run = kern.run

    @jax.jit
    def pack(pools_):
        return (pack_pool_theta(pools_.theta, T, B, d_pad),
                pack_pool_logw(pools_.log_w, T, B))

    @jax.jit
    def state_init(theta_cd, logk):
        th = jnp.zeros((d_pad, C), jnp.float32).at[:d].set(theta_cd.T)
        logw = (problem.prior_log_prob(theta_cd) + logk
                - initial_isir_proposal.log_prob(theta_cd))[None, :]
        return th, logw

    @jax.jit
    def logw_kde(kdes, theta_k, logk):
        th = theta_k[:d].T                                       # (C, d)
        logq = jax.vmap(lambda kde, x: kde.log_prob(x))(kdes, th)
        return (problem.prior_log_prob(th) + logk - logq)[None, :]

    @jax.jit
    def resolve(pools_, sel, y_prev, logk_prev):
        """Gather the last-selected candidate's dataset/kernel value from
        the pool (the kernel records only the flat slot index)."""
        s = sel[0]                                               # (C,)
        idx = jnp.maximum(s, 0.0).astype(jnp.int32)
        y_sel = jnp.take_along_axis(pools_.x, idx[:, None, None], axis=1)[:, 0]
        dis_sel = jnp.take_along_axis(pools_.dis, idx[:, None], axis=1)[:, 0]
        logk_sel = problem.kernel_log_prob(dis_sel)
        moved = s >= 0.0
        return (jnp.where(moved[:, None], y_sel, y_prev),
                jnp.where(moved, logk_sel, logk_prev))

    epoch_fn = make_epoch_fn(problem, cfg, C, epoch_chunk)

    theta_k, logw_k = state_init(cc.theta, cc.log_kernel)
    y_cur, logk = cc.y, cc.log_kernel
    theta_init_row = np.asarray(cc.theta)[:, None, :]

    if seed is None:
        seed = int(jax.random.randint(jax.random.fold_in(key, 7), (),
                                      0, 2**31 - 1))

    hat_eps = jnp.full((C,), 1.0e6, jnp.float32)
    hat_eps_hist: list[np.ndarray] = []
    blocks: list[np.ndarray] = []
    g_acc = np.zeros((C,), np.float64)
    kdes = None
    done, steps_run, ep = 0, 0, 0
    total = num_ite - 1
    ptheta, plogw = pack(pools)
    while done < total:
        take = min(T, total - done)
        theta_k, logw_k, sel, moved, hist = kern_run(
            np.int32((seed + ep) % (2**31 - 1)), ptheta, plogw,
            theta_k, logw_k,
        )
        if collect_history:
            block = np.moveaxis(np.asarray(hist)[:take, :d, :], 2, 0)
            if on_segment is not None:
                on_segment(block, done)
            blocks.append(block)
        y_cur, logk = resolve(pools, sel, y_cur, logk)
        g_acc += np.asarray(moved)[0] * (take / T)
        steps_run += take
        done += take
        if done < total:
            k_loop, k_ep = jax.random.split(k_loop)
            pools, kdes, hat_eps = epoch_fn(
                jax.random.split(k_ep, C), pools, hat_eps
            )
            hat_eps_hist.append(np.asarray(hat_eps))
            ep += 1
            ptheta, plogw = pack(pools)
            logw_k = logw_kde(kdes, theta_k, logk)

    thetas = (np.concatenate([theta_init_row] + blocks, axis=1)
              if collect_history else theta_init_row)
    att = np.full((C,), steps_run, np.int32)
    counts = MoveCounts(
        global_attempts=att,
        global_accepts=np.rint(g_acc).astype(np.int32),
        local_attempts=np.zeros((C,), np.int32),
        local_accepts=np.zeros((C,), np.int32),
    )
    return AGLResult(
        thetas=thetas, counts=counts,
        final_carry=(theta_k, y_cur, logk, logw_k),
        kde=kdes, hat_eps=np.asarray(hat_eps),
        hat_eps_hist=np.asarray(hat_eps_hist) if hat_eps_hist else None,
    )
