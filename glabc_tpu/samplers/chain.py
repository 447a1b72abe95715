"""Chain carry construction and the generic multi-chain sample driver used
by the non-adaptive samplers (GlobalMCMC, GLMCMC, GLMALA)."""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import MoveCounts, SamplerResult, run_segmented

__all__ = ["ChainCarry", "init_chain_carry", "sample_with_step"]


class ChainCarry(NamedTuple):
    theta: jnp.ndarray       # (d,)
    y: jnp.ndarray           # (d_y,)
    log_kernel: jnp.ndarray  # () — cached log K_eps(discrepancy(y))
    key: jnp.ndarray         # PRNG key
    counts: MoveCounts


def init_chain_carry(problem, key, theta0, y0=None, num_chains: int = 1):
    """Build a batched ``ChainCarry`` with a leading chain axis.

    ``theta0`` may be ``(d,)`` (broadcast to every chain, like the
    reference's single ``Initial_theta``) or ``(C, d)``.  If ``y0`` is None
    each chain simulates its own initial dataset (the reference seeds
    ``y0 = generate_samples(theta0)``, ``Mixture.py:66``).
    """
    theta0 = jnp.asarray(theta0, jnp.float32)
    if theta0.ndim == 1:
        theta0 = jnp.broadcast_to(theta0, (num_chains, theta0.shape[0]))
    C = theta0.shape[0]
    chain_keys = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(C))
    if y0 is None:
        sim_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(chain_keys)
        y0 = jax.vmap(problem.simulate)(sim_keys, theta0)
    else:
        y0 = jnp.asarray(y0, jnp.float32).reshape(-1, problem.y_dim)
        if y0.shape[0] == 1:
            y0 = jnp.broadcast_to(y0, (C, problem.y_dim))
    log_kernel = problem.kernel_log_prob(problem.discrepancy(y0))
    counts = jax.tree_util.tree_map(
        lambda z: jnp.broadcast_to(z, (C,)), MoveCounts.zeros()
    )
    return ChainCarry(theta0, y0, log_kernel, chain_keys, counts)


def sample_with_step(
    problem,
    step: Callable,
    key,
    num_ite: int,
    theta0,
    y0=None,
    num_chains: int = 1,
    segment_size: int = 10_000,
    on_segment: Optional[Callable[[np.ndarray, int], None]] = None,
    unroll: int = 1,
    checkpoint_path: Optional[str] = None,
    resume: bool = False,
    mesh=None,
    progress: bool = False,
) -> SamplerResult:
    """vmap a per-chain ``step`` over chains and scan it for ``num_ite - 1``
    transitions.  The returned chains have length ``num_ite`` with the initial
    state at index 0 (the reference writes the initial theta as the first CSV
    row, ``GLMCMC.py:43-47``).

    Checkpoint/resume (absent in the reference — SURVEY §5): with
    ``checkpoint_path`` the full carry (theta, y, cached kernel, RNG keys,
    counters) is snapshotted after every segment; ``resume=True`` restores it
    and continues exactly where the run stopped — the resumed result contains
    only the remaining transitions (earlier history is already on disk).
    """
    start = 0
    carry = None
    if resume and checkpoint_path is not None:
        from ..utils.io import carry_path, load_carry
        if os.path.exists(carry_path(checkpoint_path)):
            carry, start = load_carry(checkpoint_path)
    if carry is None:
        carry = init_chain_carry(problem, key, theta0, y0, num_chains)
    if mesh is not None:
        from ..parallel.mesh import shard_chains
        carry = shard_chains(carry, mesh)
    include_init = start == 0
    theta_init = np.asarray(carry.theta)[:, None, :]  # (C, 1, d)
    batched_step = jax.vmap(step, in_axes=(0, None))
    carry, thetas = run_segmented(
        batched_step, carry, (num_ite - 1) - start, segment_size, on_segment,
        unroll, checkpoint_path=checkpoint_path, step_offset=start,
        progress=progress,
    )
    if thetas.size and include_init:
        thetas = np.concatenate([theta_init, thetas], axis=1)
    elif not thetas.size:
        thetas = theta_init
    return SamplerResult(thetas=thetas, counts=carry.counts, final_carry=carry)
