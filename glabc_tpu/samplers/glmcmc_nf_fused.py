"""GLMCMC-NF fast paths: pooled XLA scan (any gf) and fused Pallas kernel (gf=1).

Restores the reference's *pool* semantics (``GLMCMC_NFs.py:70-140``) on the
TPU compute path — the performance-critical redesign the per-step
``samplers/glmcmc_nf.py`` scan cannot express:

* Each adaptation epoch draws ``batch_size * step_size`` flow proposals PER
  CHAIN in one chunked batched ``flow.forward`` (32-layer coupling MLPs as
  big MXU matmuls), simulates and MCMC-weights them (``GLMCMC_NFs.py:70-86``)
  — instead of 5 tiny per-chain flow forwards inside every scan step.
* Global moves are iSIR over the precomputed pool, consuming one
  ``batch_size`` slice per move (``:93-111``); the only flow evaluation left
  in the hot loop is the current state's ``log_prob`` (``:98``), batched
  across all chains into one (C, d) inverse pass per step.
* When the pool is exhausted the flow takes one Adam step of forward KL on
  an importance-resampled draw FROM THE POOL (``:114-124`` — the scan path
  substitutes fresh flow draws; this path trains on the very pool the chains
  consumed, exactly the reference), then the pool is redrawn from the updated
  flow (``:125-140``).
* ``global_frequency < 1`` uses the same fixed-segment + slack-padded-pool
  scheme as AGLMCMC (``samplers/aglmcmc.py`` module docstring): segments of
  ``round(step_size/gf)`` steps, pools carry ~5-sigma extra slices so a
  binomial overshoot never reuses a slice; what remains vs the reference is
  epoch-timing jitter, bounded by ``tests/test_nf_cadence.py``.
* ``shared_coin=True`` draws ONE global/local coin per step shared by all
  chains (each chain remains a valid GLMCMC-NF kernel; chains are no longer
  independent): the coin becomes a scalar ``lax.cond`` so local steps skip
  the flow inverse entirely — ~2x fewer flow FLOPs at gf=0.5.

At ``global_frequency == 1`` every transition is a pool-iSIR move and the
transition loop drops into the :class:`~glabc_tpu.ops.pallas.pool_isir_kernel.PoolISIR`
Pallas kernel (``run_glmcmc_nf_fused``): the carried state log-weight is
always a pool candidate's precomputed weight, the segment-entry value is
recomputed under the fresh flow on the XLA path — the same contract as
:func:`glabc_tpu.samplers.aglmcmc_fused.run_aglmcmc_fused`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.resampling import categorical_from_log_weights, systematic_resample
from .aglmcmc import (
    AGLCarry,
    Pool,
    _pool_from_proposals,
    default_pool_slack,
)
from .base import MoveCounts, StepOut, local_rw_move, tree_select
from .chain import init_chain_carry
from .glmcmc_nf import GLMCMCNFConfig, NFResult, make_optimizer

__all__ = [
    "run_glmcmc_nf_pooled",
    "run_glmcmc_nf_fused",
    "make_nf_pool_fn",
    "make_pool_trainer",
]

_SUB = 8


# --------------------------------------------------------------- pool draw
_FLOW_BLOCK_ROWS = 2048


def _flow_backend_auto(flow_backend: str, n_rows: int) -> str:
    """Resolve 'auto': the Pallas whole-stack flow kernel on any non-CPU
    backend when the row count tiles its block, else the XLA flow."""
    if flow_backend != "auto":
        return flow_backend
    try:
        on_cpu = jax.devices()[0].platform == "cpu"
    except RuntimeError:
        on_cpu = True
    return ("pallas" if (not on_cpu and n_rows % _FLOW_BLOCK_ROWS == 0)
            else "xla")


@functools.lru_cache(maxsize=64)
def make_nf_pool_fn(problem, num_chains: int, pool_slices: int,
                    batch_size: int, chunk_rows: int = 1 << 20,
                    flow_backend: str = "auto"):
    """Jitted ``(flow, key) -> Pool`` drawing ``C x pool_slices x batch_size``
    flow proposals, simulated and MCMC-weighted (``GLMCMC_NFs.py:70-86``).

    The total draw (up to ~3e7 rows at 32k chains) runs as a ``lax.map``
    over row chunks so the (rows, hidden) coupling-MLP activations never
    exceed ``chunk_rows * hidden`` floats of HBM.

    ``flow_backend='pallas'`` pushes each chunk through the whole-stack
    Pallas flow kernel (:mod:`glabc_tpu.ops.pallas.flow_kernel`) — all 32
    layers VMEM-resident per block, no per-layer HBM activation round-trips
    (the dominant cost of the XLA path at epoch scale)."""
    C = num_chains
    P = pool_slices * batch_size
    N = C * P
    n_chunks = max(1, -(-N // chunk_rows))
    chunk = -(-N // n_chunks)
    # round the chunk up so the Pallas grid tiles it exactly
    chunk = -(-chunk // _FLOW_BLOCK_ROWS) * _FLOW_BLOCK_ROWS
    n_chunks = max(1, -(-N // chunk))
    pad = n_chunks * chunk - N
    backend = _flow_backend_auto(flow_backend, chunk)

    @jax.jit
    def pool_fn(flow, key):
        k_draw, k_sim = jax.random.split(key)

        def one_chunk(k):
            kd, ks = jax.random.split(k)
            if backend == "pallas":
                from ..ops.pallas.flow_kernel import flow_push_fused
                z, log_p = flow.base.forward(kd, chunk)
                x_t, s = flow_push_fused(flow, z.T,
                                         block_rows=_FLOW_BLOCK_ROWS)
                th, log_q = x_t.T, log_p - s
            else:
                th, log_q = flow.forward(kd, chunk)
            pool = _pool_from_proposals(problem, ks, th, log_q)
            return pool

        pools = jax.lax.map(one_chunk, jax.random.split(k_draw, n_chunks))
        del k_sim

        def reshape(x):
            flat = x.reshape((n_chunks * chunk,) + x.shape[2:])
            flat = flat[:N] if pad else flat
            return flat.reshape((C, P) + x.shape[2:])

        return jax.tree_util.tree_map(reshape, pools)

    return pool_fn


# ----------------------------------------------------------------- trainer
@functools.lru_cache(maxsize=64)
def make_pool_trainer(cfg: GLMCMCNFConfig, optimizer, num_chains: int,
                      theta_dim: int, max_train: int = 65536):
    """One reference training epoch ON THE POOL (``GLMCMC_NFs.py:114-124``):
    importance-resample the pool by its MCMC weights, one Adam step of
    forward KL.  Only the first ``step_size`` slices (the reference pool —
    slack slices excluded) feed training.  For ``C == 1`` the resampled set
    is exactly the reference's ``step_size * batch_size`` draws; for many
    chains the per-chain pools are flattened and the set capped at
    ``max_train`` rows (the Adam step averages gradients, so more rows only
    reduces variance).  NaN/inf losses skip the update (``:120-122``)."""
    P_train = cfg.step_size * cfg.batch_size
    n_train = min(num_chains * P_train, max_train)

    @jax.jit
    def train(flow, opt_state, pools: Pool, key):
        theta = pools.theta[:, :P_train].reshape(-1, theta_dim)
        log_w = pools.log_w[:, :P_train].reshape(-1)
        w = jnp.exp(log_w)
        w = jnp.where(jnp.isnan(w), 0.0, w)
        w = w / jnp.sum(w)
        idx = systematic_resample(key, w, n_train)
        train_t = jax.lax.stop_gradient(theta[idx])

        loss, grads = jax.value_and_grad(lambda f: f.forward_kld(train_t))(flow)
        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, jnp.nan_to_num(g), 0.0), grads)
        updates, new_opt_state = optimizer.update(grads, opt_state, flow)
        new_flow = optax.apply_updates(flow, updates)
        return (tree_select(good, new_flow, flow),
                tree_select(good, new_opt_state, opt_state), loss)

    return train


# ------------------------------------------------------------- pooled scan
def _select_chains(coin, on_true, on_false):
    """Per-chain pytree select: ``coin (C,)`` broadcast over trailing dims."""
    def sel(a, b):
        c = coin.reshape(coin.shape + (1,) * (a.ndim - 1))
        return jnp.where(c, a, b)
    return jax.tree_util.tree_map(sel, on_true, on_false)


def _build_pooled_bodies(problem, local_proposal, cfg: GLMCMCNFConfig,
                         pool_slices: int, cadence: str = "cursor"):
    """Batched global / local transition bodies over precomputed pools.

    The global body takes each chain's current-state flow log-density
    (computed batched outside — ``GLMCMC_NFs.py:98``) and consumes a pool
    slice (``:93-111``); the local body is the usual RW-MH move
    (``:141-151``).

    ``cadence='cursor'``: each chain consumes slice ``kk`` (its private
    cursor, advanced on global coins) — the reference's sequential
    consumption, needing one ``take_along_axis`` per pool tensor because
    the cursor is per-chain (data-dependent rows).  Even batched, those
    gathers are ~3-4 ms/step at 8k chains on TPU — the dominant cost of
    the gf<1 path (``benchmarks/pooled_profile.py``; the per-chain
    ``dynamic_slice`` formulation before it was ~20 ms/step).

    ``cadence='slice'``: pool slice ``t`` belongs to step ``t`` and is
    consumed only if that step's coin is global — unconsumed slices are
    skipped.  Slices are iid draws from the same epoch proposal, so a
    skipped slice is statistically indistinguishable from sequential
    consumption (the argument, divergence class, and statistical bound are
    exactly :mod:`glabc_tpu.ops.pallas.pool_isir_mixed_kernel`'s — see its
    module docstring and ``tests/test_aglmcmc_cadence.py``).  The step
    index is uniform across chains, so the slice fetch is a
    ``dynamic_slice`` (no gathers) and the step body drops to
    flow-eval + elementwise cost.

    Both bodies are BATCHED over the chain axis with candidates selected
    by a one-hot contraction.  Per-chain PRNG semantics (one ``split`` of
    the chain key per step, ``k_move`` feeding the categorical / RW draws)
    are unchanged."""
    B = cfg.batch_size
    assert cadence in ("cursor", "slice")

    def global_move(pools: Pool, logq_old, carry: AGLCarry, t=None):
        keys = jax.vmap(jax.random.split)(carry.key)         # (C, 2, 2)
        key_next, k_move = keys[:, 0], keys[:, 1]
        if cadence == "slice":
            start = jnp.minimum(t, pool_slices - 1) * B      # scalar
            th_s = jax.lax.dynamic_slice_in_dim(pools.theta, start, B, 1)
            x_s = jax.lax.dynamic_slice_in_dim(pools.x, start, B, 1)
            dis_s = jax.lax.dynamic_slice_in_dim(pools.dis, start, B, 1)
            lw_s = jax.lax.dynamic_slice_in_dim(pools.log_w, start, B, 1)
        else:
            start = jnp.minimum(carry.kk, pool_slices - 1) * B   # (C,)
            idx = start[:, None] + jnp.arange(B)[None, :]        # (C, B)
            th_s = jnp.take_along_axis(pools.theta, idx[:, :, None], axis=1)
            x_s = jnp.take_along_axis(pools.x, idx[:, :, None], axis=1)
            dis_s = jnp.take_along_axis(pools.dis, idx, axis=1)
            lw_s = jnp.take_along_axis(pools.log_w, idx, axis=1)

        log_w_old = (problem.prior_log_prob(carry.theta) + carry.log_kernel
                     - logq_old)                              # (C,)
        log_w = jnp.concatenate([log_w_old[:, None], lw_s], axis=1)
        ind = jax.vmap(categorical_from_log_weights)(k_move, log_w)  # (C,)
        cand_th = jnp.concatenate([carry.theta[:, None, :], th_s], axis=1)
        cand_y = jnp.concatenate([carry.y[:, None, :], x_s], axis=1)
        cand_lk = jnp.concatenate(
            [carry.log_kernel[:, None], problem.kernel_log_prob(dis_s)],
            axis=1)                                           # (C, B+1)
        onehot = (ind[:, None] == jnp.arange(B + 1)[None, :]).astype(
            cand_th.dtype)                                    # (C, B+1)
        new_theta = jnp.einsum("cb,cbd->cd", onehot, cand_th)
        new_y = jnp.einsum("cb,cbd->cd", onehot, cand_y)
        new_lk = jnp.sum(onehot * cand_lk, axis=1)
        accepted = ind != 0
        counts = carry.counts.update(jnp.ones_like(accepted), accepted)
        new = AGLCarry(new_theta, new_y, new_lk, carry.kk + 1, key_next,
                       counts)
        return new, StepOut(new_theta, accepted,
                            jnp.ones_like(accepted))

    def local_move_one(carry: AGLCarry):
        key, k_move = jax.random.split(carry.key)
        theta, y, lk, accepted = local_rw_move(
            problem, local_proposal, k_move, carry.theta, carry.y,
            carry.log_kernel, cfg.support_retries)
        counts = carry.counts.update(jnp.bool_(False), accepted)
        new = AGLCarry(theta, y, lk, carry.kk, key, counts)
        return new, StepOut(theta, accepted, jnp.bool_(False))

    return global_move, jax.vmap(local_move_one)


def _pytree_key(tree):
    """Hashable by-value key for a small array pytree (distribution params)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return (treedef, tuple(
        (np.asarray(x).shape, np.asarray(x).dtype.str, np.asarray(x).tobytes())
        for x in leaves))


# insertion-ordered dict as a bounded FIFO cache (mirrors the maxsize=64
# lru_caches on the other driver helper factories — a long-lived process
# sweeping proposal scales must not accumulate compiled segments forever)
_SEGMENT_CACHE: dict = {}
_SEGMENT_CACHE_MAX = 64


def make_pooled_segment(problem, local_proposal, flow_template,
                        cfg: GLMCMCNFConfig, pool_slices: int,
                        shared_coin: bool, flow_backend: str = "xla",
                        cadence: str = "cursor"):
    """Jitted ``segment(flow, pools, carry, coin_key, length)`` advancing all
    chains ``length`` steps over their pools.

    Per-chain coin (reference kernel, independent chains): every step
    computes one batched ``flow.log_prob`` over all chains' states and a
    vmapped ``lax.cond`` picks global/local per chain.  Shared coin: the
    coin is a scalar ``lax.cond`` — local steps skip the flow inverse.
    ``flow_backend='pallas'`` runs that per-step batched inverse through
    the whole-stack Pallas flow kernel (chain count must tile its block).
    ``cadence='slice'``: slice-per-step pool consumption (gather-free; see
    :func:`_build_pooled_bodies`) — requires ``pool_slices >= length``."""
    del flow_template
    cache_key = (problem, _pytree_key(local_proposal), cfg, pool_slices,
                 shared_coin, flow_backend, cadence)
    if cache_key in _SEGMENT_CACHE:
        return _SEGMENT_CACHE[cache_key]
    gf = cfg.global_frequency
    v_global, v_local = _build_pooled_bodies(
        problem, local_proposal, cfg, pool_slices, cadence)

    if flow_backend == "pallas":
        from ..ops.pallas.flow_kernel import flow_pull_fused

        def batched_logq(flow_, theta_cd):
            z_t, s = flow_pull_fused(flow_, theta_cd.T,
                                     block_rows=_FLOW_BLOCK_ROWS)
            return flow_.base.log_prob(z_t.T) - s
    else:
        def batched_logq(flow_, theta_cd):
            return flow_.log_prob(theta_cd)

    if shared_coin:
        @functools.partial(jax.jit, static_argnames=("length",))
        def segment(flow, pools, carry, coin_key, length):
            coins = jax.random.uniform(coin_key, (length,)) < gf
            ts = jnp.arange(length, dtype=jnp.int32)

            def body(c, xs):
                coin, t = xs

                def g(c):
                    logq = batched_logq(flow, c.theta)
                    return v_global(pools, logq, c, t)

                return jax.lax.cond(coin, g, v_local, c)

            return jax.lax.scan(body, carry, (coins, ts))
    else:
        @functools.partial(jax.jit, static_argnames=("length",))
        def segment(flow, pools, carry, coin_key, length):
            def body(c, xs):
                k_step, t = xs
                logq = batched_logq(flow, c.theta)
                coins = (jax.random.uniform(k_step, (c.theta.shape[0],))
                         < gf)
                g_carry, g_out = v_global(pools, logq, c, t)
                l_carry, l_out = v_local(c)
                return (_select_chains(coins, g_carry, l_carry),
                        _select_chains(coins, g_out, l_out))

            keys = jax.random.split(coin_key, length)
            ts = jnp.arange(length, dtype=jnp.int32)
            return jax.lax.scan(body, carry, (keys, ts))

    while len(_SEGMENT_CACHE) >= _SEGMENT_CACHE_MAX:
        _SEGMENT_CACHE.pop(next(iter(_SEGMENT_CACHE)))
    _SEGMENT_CACHE[cache_key] = segment
    return segment


def run_glmcmc_nf_pooled(problem, key, num_ite, theta0, local_proposal,
                         base=None, global_frequency=0.5, batch_size=5,
                         step_size=200, train_steps=50, y0=None,
                         num_chains: int = 1, n_layers: int = 32,
                         hidden: int = 128, on_segment=None, flow=None,
                         support_retries: int = 0, shared_coin: bool = False,
                         pool_slack: Optional[int] = None,
                         max_train: int = 65536,
                         chunk_rows: int = 1 << 20,
                         learning_rate: float = 5e-4,
                         weight_decay: float = 1e-5,
                         checkpoint_path: str | None = None,
                         resume: bool = False,
                         flow_backend: str = "auto",
                         cadence: str = "cursor",
                         collect_history: bool = True,
                         thin: int = 1,
                         history_dtype=None) -> NFResult:
    """GLMCMC-NF via the pooled XLA fast path (reference pool semantics).

    Same Markov kernel as :func:`glabc_tpu.samplers.glmcmc_nf.run_glmcmc_nf`
    (which draws fresh flow proposals per move); this path precomputes the
    reference's proposal pools per epoch and trains on them — see the module
    docstring.  ~10-100x the per-step scan path at canonical configs.

    ``cadence='slice'`` switches pool consumption to slice-per-step (one
    slice per transition, consumed only on global coins — gather-free; see
    :func:`_build_pooled_bodies`): pools carry ``seg_len`` slices instead
    of ``step_size + slack``, the training set is the full pool (``1/gf``
    times the reference's rows, the same documented variance-reducing
    divergence as the mixed AGLMCMC kernel), and the per-step pool fetch
    is a uniform ``dynamic_slice`` — at gf<1 this removes the per-chain
    cursor gathers that otherwise dominate the step (~3-4 ms/step at 8k
    chains)."""
    from ..models.flows import CouplingFlow

    cfg = GLMCMCNFConfig(global_frequency, batch_size, step_size, train_steps,
                         n_layers, hidden, learning_rate, weight_decay,
                         support_retries=support_retries)
    assert cadence in ("cursor", "slice")
    seg_len_pre = (max(1, int(round(step_size / global_frequency)))
                   if global_frequency > 0 else (num_ite - 1))
    if cadence == "slice":
        pool_slack = seg_len_pre - step_size
        pool_slices = seg_len_pre
    else:
        if pool_slack is None:
            pool_slack = default_pool_slack(step_size, global_frequency)
        pool_slices = step_size + pool_slack
    C = num_chains
    d = problem.theta_dim

    key = jnp.asarray(key)
    k_flow, k_chain, k_loop = jax.random.split(key, 3)
    if flow is None:
        flow = CouplingFlow.create(k_flow, d, n_layers, hidden, base=base)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(flow)

    cc = init_chain_carry(problem, k_chain, theta0, y0, C)
    carry = AGLCarry(cc.theta, cc.y, cc.log_kernel,
                     jnp.zeros((C,), jnp.int32), cc.key, cc.counts)
    theta_init = np.asarray(carry.theta)[:, None, :]

    pool_fn = make_nf_pool_fn(problem, C, pool_slices, batch_size,
                              chunk_rows, flow_backend)
    train = make_pool_trainer(cfg, optimizer, C, d, max_train)
    segment = make_pooled_segment(problem, local_proposal, flow, cfg,
                                  pool_slices, shared_coin,
                                  _flow_backend_auto(flow_backend, C),
                                  cadence)

    seg_len = seg_len_pre

    k_loop, k_pool0 = jax.random.split(k_loop)
    pools = pool_fn(flow, k_pool0)

    from .aglmcmc_fused import _AsyncBlocks, _history_opts
    blocks, losses = [], []
    thin, hist_dt = _history_opts(thin, history_dtype, on_segment)
    if hist_dt is not None:
        theta_init = theta_init.astype(hist_dt)
    # scan-path history is (take, C, d): unpadded, so only the transfer is
    # deferred (thin/dtype compression happens on device below; the
    # ~30 MB/s tunnel is the history-on wall at canonical configs)
    async_blocks = _AsyncBlocks(d, post=lambda a: np.moveaxis(a, 0, 1))
    num_train = 0
    done, total = 0, num_ite - 1
    pending_epoch = False

    from ._fused_io import restore_epoch_ckpt, save_epoch_ckpt
    ckpt_meta = {"sampler": "glmcmc_nf_pooled", "num_chains": C,
                 "theta_dim": d, "seg_len": seg_len,
                 "pool_slices": pool_slices, "batch_size": batch_size,
                 "n_layers": n_layers, "hidden": hidden,
                 "cadence": cadence}
    restored = (restore_epoch_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is not None:
        state, done = restored
        flow, opt_state, pools, carry, k_loop = (
            state["flow"], state["opt_state"], state["pools"],
            state["carry"], state["k_loop"])
        num_train = int(state["num_train"])
        losses = [float(x) for x in np.asarray(state["losses"]).ravel()]
        pending_epoch = True
        theta_init = None

    while done < total:
        if pending_epoch:
            # pool exhausted: train on it, then redraw from the updated flow
            # (GLMCMC_NFs.py:112-140; redraw happens even after training
            # stops at Train_step)
            k_loop, k_tr, k_pl = jax.random.split(k_loop, 3)
            if num_train < train_steps:
                flow, opt_state, loss = train(flow, opt_state, pools, k_tr)
                losses.append(loss)  # device scalar; materialized at the end
                num_train += 1
            pools = pool_fn(flow, k_pl)
            carry = carry._replace(kk=carry.kk * 0)
            pending_epoch = False
        take = min(seg_len, total - done)
        k_loop, k_coin = jax.random.split(k_loop)
        carry, outs = segment(flow, pools, carry, k_coin, take)
        if not collect_history:
            pass
        elif on_segment is not None:
            blocks.append(np.moveaxis(np.asarray(outs.theta), 0, 1))
            on_segment(blocks[-1], done)
        else:
            dev = outs.theta
            if thin > 1:
                r0 = (-(done + 1)) % thin
                dev = dev[r0::thin] if r0 < take else None
            if dev is not None:
                if hist_dt is not None:
                    dev = dev.astype(hist_dt)
                async_blocks.add_raw(dev)
        done += take
        if take == seg_len:
            if done < total:
                pending_epoch = True
            if checkpoint_path is not None:
                save_epoch_ckpt(
                    checkpoint_path,
                    {"flow": flow, "opt_state": opt_state, "pools": pools,
                     "carry": carry, "k_loop": k_loop,
                     "num_train": num_train,
                     "losses": np.asarray([float(x) for x in losses],
                                          np.float64)},
                    done, take, seg_len, meta=ckpt_meta)

    if on_segment is None:
        blocks = async_blocks.blocks()
    head = [theta_init] if theta_init is not None else []
    thetas = (np.concatenate(head + blocks, axis=1) if blocks or head
              else np.zeros((C, 0, d), np.float32))
    return NFResult(
        thetas=thetas, counts=carry.counts, final_carry=carry,
        flow=flow, loss_hist=np.asarray([float(x) for x in losses]),
    )


@functools.lru_cache(maxsize=64)
def _make_nf_fused_helpers(problem, d: int, d_pad: int, C: int, T: int,
                           B: int):
    from ..ops.pallas.pool_isir_kernel import pack_pool_logw, pack_pool_theta

    @jax.jit
    def pack(pools_):
        return (pack_pool_theta(pools_.theta, T, B, d_pad),
                pack_pool_logw(pools_.log_w, T, B))

    @jax.jit
    def state_logw(flow_, theta_k, logk):
        """Segment-entry carried log-weight under the CURRENT flow — exactly
        the reference's per-global-move recompute (``GLMCMC_NFs.py:98-101``),
        hoisted to once per epoch (between epochs the state is always a pool
        candidate whose weight the kernel carries)."""
        th = theta_k[:d].T
        logq = flow_.log_prob_t(theta_k[:d])
        return (problem.prior_log_prob(th) + logk - logq)[None, :]

    @jax.jit
    def state_init(theta_cd):
        return jnp.zeros((d_pad, C), jnp.float32).at[:d].set(theta_cd.T)

    @jax.jit
    def resolve(pools_, sel, y_prev, logk_prev):
        s = sel[0]
        idx = jnp.maximum(s, 0.0).astype(jnp.int32)
        y_sel = jnp.take_along_axis(pools_.x, idx[:, None, None],
                                    axis=1)[:, 0]
        dis_sel = jnp.take_along_axis(pools_.dis, idx[:, None], axis=1)[:, 0]
        logk_sel = problem.kernel_log_prob(dis_sel)
        moved = s >= 0.0
        return (jnp.where(moved[:, None], y_sel, y_prev),
                jnp.where(moved, logk_sel, logk_prev))

    return pack, state_logw, state_init, resolve


# ---------------------------------------------------------- Pallas (gf = 1)
def run_glmcmc_nf_fused(problem, key, num_ite, theta0, local_proposal=None,
                        base=None, batch_size=5, step_size=200,
                        train_steps=50, y0=None, num_chains: int = 4096,
                        n_layers: int = 32, hidden: int = 128,
                        block_chains: int = 1024, collect_history: bool = True,
                        on_segment=None, flow=None, seed: int | None = None,
                        max_train: int = 65536, chunk_rows: int = 1 << 20,
                        learning_rate: float = 5e-4,
                        weight_decay: float = 1e-5,
                        interpret: bool = False, mesh=None,
                        checkpoint_path: str | None = None,
                        resume: bool = False,
                        flow_backend: str = "auto",
                        thin: int = 1,
                        history_dtype=None) -> NFResult:
    """GLMCMC-NF at ``global_frequency = 1`` via the fused pool-iSIR Pallas
    kernel: every transition is an iSIR move over a precomputed flow pool, so
    the in-kernel step is pure data selection; flow sampling, training, and
    the segment-entry state log-weight run on the XLA path between
    ``pallas_call``s.  Same driver contract as
    :func:`glabc_tpu.samplers.aglmcmc_fused.run_aglmcmc_fused` (history of
    exactly ``num_ite`` rows; final carry may be ahead on a ragged final
    segment; per-segment move counts scaled pro-rata; ``thin``/
    ``history_dtype`` compress the async device->host history the same
    way)."""
    from ..models.flows import CouplingFlow
    from ..ops.pallas.pool_isir_kernel import PoolISIR

    del local_proposal  # gf=1: no local moves
    d = problem.theta_dim
    d_pad = max(_SUB, ((d + _SUB - 1) // _SUB) * _SUB)
    T, B, C = int(step_size), int(batch_size), int(num_chains)
    cfg = GLMCMCNFConfig(1.0, B, T, train_steps, n_layers, hidden,
                         learning_rate, weight_decay)

    key = jnp.asarray(key)
    k_flow, k_chain, k_loop = jax.random.split(key, 3)
    if flow is None:
        flow = CouplingFlow.create(k_flow, d, n_layers, hidden, base=base)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(flow)

    cc = init_chain_carry(problem, k_chain, theta0, y0, C)
    pool_fn = make_nf_pool_fn(problem, C, T, B, chunk_rows, flow_backend)
    train = make_pool_trainer(cfg, optimizer, C, d, max_train)

    kern = PoolISIR(d, batch_size=B, steps_per_call=T,
                    block_chains=block_chains,
                    collect_history=collect_history, interpret=interpret)
    if mesh is not None:
        kern_run = kern.make_sharded_run(mesh)
    else:
        kern_run = kern.run

    pack, state_logw, state_init, resolve = _make_nf_fused_helpers(
        problem, d, d_pad, C, T, B)

    k_loop, k_pool0 = jax.random.split(k_loop)
    pools = pool_fn(flow, k_pool0)
    theta_k = state_init(cc.theta)
    logw_k = state_logw(flow, theta_k, cc.log_kernel)
    y_cur, logk = cc.y, cc.log_kernel
    theta_init_row = np.asarray(cc.theta)[:, None, :]

    if seed is None:
        seed = int(jax.random.randint(jax.random.fold_in(key, 7), (),
                                      0, 2**31 - 1))

    from .aglmcmc_fused import (_AsyncBlocks, _acc_row, _check_count_range,
                                _fused_final_carry, _history_opts)
    _check_count_range(num_ite)
    blocks, losses = [], []
    thin, hist_dt = _history_opts(thin, history_dtype, on_segment)
    async_blocks = _AsyncBlocks(d, thin=thin, dtype=hist_dt)
    if hist_dt is not None:
        theta_init_row = theta_init_row.astype(hist_dt)
    g_acc = jnp.zeros((C,), jnp.float32)
    num_train = 0
    done, steps_run, ep = 0, 0, 0
    total = num_ite - 1
    pending_epoch = False

    from ._fused_io import restore_epoch_ckpt, save_epoch_ckpt
    ckpt_meta = {"sampler": "glmcmc_nf_fused", "num_chains": C,
                 "theta_dim": d, "steps_per_call": T, "batch_size": B,
                 "block_chains": block_chains, "n_layers": n_layers,
                 "hidden": hidden}
    restored = (restore_epoch_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is not None:
        state, done = restored
        flow, opt_state, pools = (state["flow"], state["opt_state"],
                                  state["pools"])
        theta_k, logw_k = state["theta_k"], state["logw_k"]
        y_cur, logk = state["y_cur"], state["logk"]
        g_acc = jnp.asarray(state["g_acc"], jnp.float32)
        steps_run, ep = int(state["steps_run"]), int(state["ep"])
        num_train = int(state["num_train"])
        seed, k_loop = int(state["seed"]), state["k_loop"]
        losses = [float(x) for x in np.asarray(state["losses"]).ravel()]
        pending_epoch = True
        theta_init_row = None

    ptheta, plogw = pack(pools)
    while done < total:
        if pending_epoch:
            k_loop, k_tr, k_pl = jax.random.split(k_loop, 3)
            if num_train < train_steps:
                flow, opt_state, loss = train(flow, opt_state, pools, k_tr)
                # device scalar; float() here would sync behind the
                # in-flight history copy — materialized at the end
                losses.append(loss)
                num_train += 1
            pools = pool_fn(flow, k_pl)
            ep += 1
            ptheta, plogw = pack(pools)
            logw_k = state_logw(flow, theta_k, logk)
            pending_epoch = False
        take = min(T, total - done)
        theta_k, logw_k, sel, moved, hist = kern_run(
            np.int32((seed + ep) % (2**31 - 1)), ptheta, plogw,
            theta_k, logw_k)
        if collect_history:
            if on_segment is not None:
                block = np.moveaxis(np.asarray(hist)[:take, :d, :], 2, 0)
                on_segment(block, done)
                blocks.append(block)
            else:
                async_blocks.add(hist, take, done)
        y_cur, logk = resolve(pools, sel, y_cur, logk)
        g_acc = _acc_row(g_acc, moved, take / T)
        steps_run += take
        done += take
        if take == T:
            if done < total:
                pending_epoch = True
            if checkpoint_path is not None:
                save_epoch_ckpt(
                    checkpoint_path,
                    {"flow": flow, "opt_state": opt_state, "pools": pools,
                     "theta_k": theta_k, "logw_k": logw_k, "y_cur": y_cur,
                     "logk": logk, "g_acc": g_acc, "steps_run": steps_run,
                     "ep": ep, "num_train": num_train, "seed": seed,
                     "k_loop": k_loop,
                     "losses": np.asarray([float(x) for x in losses],
                                          np.float64)},
                    done, take, T, meta=ckpt_meta)

    if collect_history and on_segment is None:
        blocks = async_blocks.blocks()
    head = [theta_init_row] if theta_init_row is not None else []
    if collect_history and (head or blocks):
        thetas = np.concatenate(head + blocks, axis=1)
    elif head:
        thetas = theta_init_row
    else:
        thetas = np.zeros((C, 0, d), np.float32)
    att = np.full((C,), steps_run, np.int32)
    counts = MoveCounts(
        global_attempts=att,
        global_accepts=np.rint(np.asarray(g_acc)).astype(np.int32),
        local_attempts=np.zeros((C,), np.int32),
        local_accepts=np.zeros((C,), np.int32),
    )
    return NFResult(
        thetas=thetas, counts=counts,
        final_carry=_fused_final_carry(problem, d, theta_k, y_cur, logk,
                                       counts, key),
        flow=flow, loss_hist=np.asarray([float(x) for x in losses]),
        fused_state=(theta_k, y_cur, logk, logw_k),
    )
