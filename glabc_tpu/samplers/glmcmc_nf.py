"""GLMCMC-NF: iSIR global proposal from a normalizing flow trained online.

Capability parity with reference ``glabcmcmc/GLMCMC_NFs.py:43-186``: the
global proposal is an affine-coupling flow, periodically refit by one Adam
step of forward KL on importance-resampled flow proposals, interleaved with
chain transitions; local moves are random-walk MH.

TPU-first redesign of the reference's epoch structure:

* The reference precomputes a proposal *pool* of ``batch_size * step_size``
  flow samples, consumes one ``batch_size`` slice per global move, and when
  the pool is exhausted (a data-dependent event — local moves don't advance
  the cursor) trains on the pool and refreshes it (``GLMCMC_NFs.py:70-140``).
  The pool is purely a caching device: each slice is used exactly once, and
  the training set is an importance-resampled draw from the flow.  Here the
  chain draws ``batch_size`` *fresh* proposals per global move (same Markov
  kernel, no stale pool), and the training epoch — sample
  ``batch_size * step_size`` from the flow, simulate, weight, systematically
  resample, one Adam step — runs between fixed-length scan segments of
  ``round(step_size / global_frequency)`` steps, matching the reference's
  expected training cadence with static shapes.
* One flow is shared by all vmapped chains (the reference is single-chain;
  with many chains the shared flow is simply trained at the same cadence).
* The optimizer matches ``torch.optim.Adam(lr=5e-4, weight_decay=1e-5)``
  (``GLMCMC_NFs.py:63``): L2-coupled Adam, i.e. decayed weights added to the
  gradient *before* the Adam moments.
* NaN/inf training losses skip the update (``GLMCMC_NFs.py:120-122``); NaN
  proposal rows get zero weight (``:83-85``).

The per-epoch flow refit is the hook for data-parallel scaling: gradients
from per-device training shards are combined with ``psum`` (see
``glabc_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.distributions import DiagGaussian
from ..models.flows import CouplingFlow
from ..ops.resampling import systematic_resample
from .base import SamplerResult, StepOut, isir_move, local_rw_move, tree_select
from .chain import ChainCarry, init_chain_carry

__all__ = ["GLMCMCNFConfig", "make_flow_trainer", "run_glmcmc_nf", "NFResult"]


@dataclasses.dataclass(frozen=True)
class GLMCMCNFConfig:
    global_frequency: float = 0.5
    batch_size: int = 5
    step_size: int = 200          # global moves per training epoch
    train_steps: int = 50         # max Adam steps (reference Train_step)
    n_layers: int = 32
    hidden: int = 128
    learning_rate: float = 5e-4
    weight_decay: float = 1e-5
    support_retries: int = 0
    # 'flow_is': importance-resampled flow samples (reference semantics,
    #            GLMCMC_NFs.py:114-124).
    # 'chain_states': pooled current chain states from all vmapped chains —
    #            the scaled adaptation signal (the chains ARE approximate
    #            posterior draws); falls back to flow_is for few chains.
    train_on: str = "flow_is"
    # Adam steps per training epoch.  The reference takes exactly ONE step
    # per pool refresh (GLMCMC_NFs.py:115-123), so its flow barely moves in
    # Train_step=50 epochs; >1 makes the proposal adaptation effective.
    train_iters_per_epoch: int = 1


@functools.lru_cache(maxsize=64)
def make_optimizer(cfg: GLMCMCNFConfig):
    """torch-style Adam with L2-coupled weight decay.  Process-cached on the
    config so the optimizer object (and anything jit-cached against its
    identity) is stable across driver calls."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale(-cfg.learning_rate),
    )


def make_flow_trainer(problem, cfg: GLMCMCNFConfig, optimizer):
    """One training epoch: flow-IS pool -> systematic resample -> Adam step.

    Returns ``train(flow, opt_state, key) -> (flow, opt_state, loss)``.
    Pure and jittable; gradients are averaged over the resampled pool so the
    sharded variant can psum them across devices.
    """
    pool_n = cfg.batch_size * cfg.step_size

    def train(flow: CouplingFlow, opt_state, key):
        k_pool, k_res = jax.random.split(key)
        k_sample, k_sim = jax.random.split(k_pool)
        pool, log_q = flow.forward(k_sample, pool_n)
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
        idx = systematic_resample(k_res, w, pool_n)
        train_t = jax.lax.stop_gradient(pool_safe[idx])

        loss, grads = jax.value_and_grad(lambda f: f.forward_kld(train_t))(flow)
        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, jnp.nan_to_num(g), 0.0), grads
        )
        updates, new_opt_state = optimizer.update(
            grads, opt_state, flow
        )
        new_flow = optax.apply_updates(flow, updates)
        flow = tree_select(good, new_flow, flow)
        opt_state = tree_select(good, new_opt_state, opt_state)
        return flow, opt_state, loss

    return train


def make_chain_state_trainer(cfg: GLMCMCNFConfig, optimizer):
    """One training epoch on pooled chain states: the vmapped chains'
    current thetas are (approximate) posterior draws, so the flow is fit by
    forward KLD directly on them — no importance weights needed.  Returns
    ``train(flow, opt_state, pooled_states) -> (flow, opt_state, loss)``.
    In sharded runs the pooled states are the all-gathered chain axis."""

    def train(flow: CouplingFlow, opt_state, states):
        train_t = jax.lax.stop_gradient(states)
        loss, grads = jax.value_and_grad(lambda f: f.forward_kld(train_t))(flow)
        good = jnp.isfinite(loss)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(good, jnp.nan_to_num(g), 0.0), grads
        )
        updates, new_opt_state = optimizer.update(grads, opt_state, flow)
        new_flow = optax.apply_updates(flow, updates)
        flow = tree_select(good, new_flow, flow)
        opt_state = tree_select(good, new_opt_state, opt_state)
        return flow, opt_state, loss

    return train


def build_nf_step(problem, local_proposal, cfg: GLMCMCNFConfig):
    """Per-chain transition kernel parameterized by the current flow:
    ``step(flow, carry, _)``."""
    gf = cfg.global_frequency

    def step(flow, carry: ChainCarry, _):
        key, k_coin, k_move = jax.random.split(carry.key, 3)
        is_global = jax.random.uniform(k_coin, ()) < gf

        def do_global(k):
            return isir_move(
                problem, flow, k, carry.theta, carry.y,
                carry.log_kernel, cfg.batch_size,
            )

        def do_local(k):
            return local_rw_move(
                problem, local_proposal, k, carry.theta, carry.y,
                carry.log_kernel, cfg.support_retries,
            )

        theta, y, log_kernel, accepted = jax.lax.cond(
            is_global, do_global, do_local, k_move
        )
        counts = carry.counts.update(is_global, accepted)
        new_carry = ChainCarry(theta, y, log_kernel, key, counts)
        return new_carry, StepOut(theta, accepted, is_global)

    return step


@dataclasses.dataclass
class NFResult(SamplerResult):
    flow: Optional[CouplingFlow] = None
    loss_hist: Optional[np.ndarray] = None
    # fused driver only: raw packed kernel tiles (theta (d_pad, C), y,
    # log_kernel, carried pool log-weight); final_carry is the normalized
    # scan-path carry
    fused_state: Optional[tuple] = None


def run_glmcmc_nf(problem, key, num_ite, theta0, local_proposal,
                  base: DiagGaussian | None = None, global_frequency=0.5,
                  batch_size=5, step_size=200, train_steps=50, y0=None,
                  num_chains: int = 1, n_layers: int = 32, hidden: int = 128,
                  on_segment=None, flow: CouplingFlow | None = None,
                  support_retries: int = 0,
                  train_on: str = "flow_is",
                  train_iters_per_epoch: int = 1, mesh=None,
                  checkpoint_path: str | None = None,
                  resume: bool = False) -> NFResult:
    """``mesh``: a 1-D :class:`jax.sharding.Mesh` shards the chain axis over
    devices; the transition scan partitions with zero collectives and the
    per-epoch flow refit runs data-parallel inside ``shard_map`` — per-device
    pool/state shards, ``pmean``-ed gradients, replicated flow (the
    end-to-end distributed adaptation of SURVEY §2d).

    ``checkpoint_path``/``resume``: snapshot the full adaptation state
    (flow + Adam moments, chain carry, RNG keys, training counters) after
    every aligned segment; ``resume=True`` continues bitwise-identically
    from the last snapshot, returning only post-resume history (see
    :func:`glabc_tpu.samplers._fused_io.save_epoch_ckpt`)."""
    cfg = GLMCMCNFConfig(global_frequency, batch_size, step_size, train_steps,
                         n_layers, hidden, support_retries=support_retries,
                         train_on=train_on,
                         train_iters_per_epoch=train_iters_per_epoch)
    k_flow, k_chain, k_train = jax.random.split(jnp.asarray(key), 3)
    if flow is None:
        flow = CouplingFlow.create(k_flow, problem.theta_dim, n_layers, hidden,
                                   base=base)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(flow)
    if mesh is not None:
        from ..parallel.sharded import (
            make_sharded_chain_state_trainer,
            make_sharded_flow_trainer,
        )
        assert num_chains % mesh.devices.size == 0, (
            "num_chains must divide by the mesh size")
        train = make_sharded_flow_trainer(problem, cfg, optimizer, mesh)
        train_states = make_sharded_chain_state_trainer(optimizer, mesh)
    else:
        train = jax.jit(make_flow_trainer(problem, cfg, optimizer))
        train_states = jax.jit(make_chain_state_trainer(cfg, optimizer))

    step = build_nf_step(problem, local_proposal, cfg)
    carry = init_chain_carry(problem, k_chain, theta0, y0, num_chains)
    theta_init = np.asarray(carry.theta)[:, None, :]
    if mesh is not None:
        from ..parallel.mesh import shard_chains
        carry = shard_chains(carry, mesh)

    batched = jax.vmap(step, in_axes=(None, 0, None))

    @functools.partial(jax.jit, static_argnames=("length",))
    def segment(flow_, carry_, length):
        return jax.lax.scan(
            functools.partial(batched, flow_), carry_, None, length=length
        )

    # Training cadence: the reference trains after `step_size` *global* moves
    # (GLMCMC_NFs.py:112); with coin probability gf that is step_size/gf
    # steps in expectation.
    seg_len = max(1, int(round(step_size / max(global_frequency, 1e-6))))

    from ._fused_io import restore_epoch_ckpt, save_epoch_ckpt
    ckpt_meta = {"sampler": "glmcmc_nf", "num_chains": num_chains,
                 "theta_dim": problem.theta_dim, "seg_len": seg_len,
                 "n_layers": n_layers, "hidden": hidden,
                 "train_on": train_on}
    total = num_ite - 1
    blocks = []
    losses: list = []
    num_train = 0
    done = 0
    pending_epoch = False
    restored = (restore_epoch_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is not None:
        state, done = restored
        flow, opt_state, carry, k_train = (
            state["flow"], state["opt_state"], state["carry"],
            state["k_train"])
        num_train = int(state["num_train"])
        losses = [float(x) for x in np.asarray(state["losses"]).ravel()]
        pending_epoch = True
        theta_init = None
        if mesh is not None:
            from ..parallel.mesh import shard_chains
            carry = shard_chains(carry, mesh)

    while done < total:
        if pending_epoch:
            # pre-epoch snapshots: the pending epoch replays bitwise on
            # resume (see _fused_io module docstring)
            if num_train < train_steps:
                for _ in range(cfg.train_iters_per_epoch):
                    k_train, k_ep = jax.random.split(k_train)
                    if cfg.train_on == "chain_states":
                        flow, opt_state, loss = train_states(
                            flow, opt_state, carry.theta
                        )
                    else:
                        flow, opt_state, loss = train(flow, opt_state, k_ep)
                    losses.append(float(loss))
                num_train += 1
            pending_epoch = False
        take = min(seg_len, total - done)
        carry, outs = segment(flow, carry, take)
        blocks.append(np.moveaxis(np.asarray(outs.theta), 0, 1))
        if on_segment is not None:
            on_segment(blocks[-1], done)
        done += take
        if take == seg_len:
            if done < total:
                pending_epoch = True
            if checkpoint_path is not None:
                save_epoch_ckpt(
                    checkpoint_path,
                    {"flow": flow, "opt_state": opt_state, "carry": carry,
                     "k_train": k_train, "num_train": num_train,
                     "losses": np.asarray(losses, np.float64)},
                    done, take, seg_len, meta=ckpt_meta)

    head = [theta_init] if theta_init is not None else []
    thetas = (np.concatenate(head + blocks, axis=1) if blocks or head
              else np.zeros((num_chains, 0, problem.theta_dim), np.float32))
    return NFResult(
        thetas=thetas, counts=carry.counts, final_carry=carry,
        flow=flow, loss_hist=np.asarray(losses),
    )
