"""Shared sampler machinery: moves, carries, and the scan driver.

TPU-first redesign of the reference sampler skeleton (per-iteration Python
loops, e.g. ``GlobalMCMC.py:37``): every sampler here is a pure
``step(carry, _) -> (carry, out)`` function run under ``jax.lax.scan``,
jit-compiled once, and vmapped over a chain axis.  The per-iteration
global-vs-local Bernoulli coin (``GlobalMCMC.py:39``) becomes ``lax.cond``
(select of both branches under vmap).  Chain history is collected in
fixed-size segments and streamed to host, replacing the reference's
10k-iteration CSV flushes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resampling import categorical_from_log_weights

__all__ = [
    "StepOut",
    "MoveCounts",
    "local_rw_move",
    "isir_move",
    "independence_mh_move",
    "tree_select",
    "run_segmented",
    "SamplerResult",
]


class StepOut(NamedTuple):
    """Per-step output: the recorded chain state plus move bookkeeping."""

    theta: jnp.ndarray      # (d,)
    accepted: jnp.ndarray   # bool — move accepted this step
    is_global: jnp.ndarray  # bool — the step took the global branch


class MoveCounts(NamedTuple):
    """Acceptance bookkeeping carried through the scan.

    The reference maintains (and drops) a single ``num_acc`` counter
    (``GlobalMCMC.py:33``); here acceptance is reported per move type.
    """

    global_attempts: jnp.ndarray
    global_accepts: jnp.ndarray
    local_attempts: jnp.ndarray
    local_accepts: jnp.ndarray

    @staticmethod
    def zeros() -> "MoveCounts":
        z = jnp.zeros((), jnp.int32)
        return MoveCounts(z, z, z, z)

    def update(self, is_global, accepted) -> "MoveCounts":
        ig = is_global.astype(jnp.int32)
        acc = accepted.astype(jnp.int32)
        return MoveCounts(
            self.global_attempts + ig,
            self.global_accepts + ig * acc,
            self.local_attempts + (1 - ig),
            self.local_accepts + (1 - ig) * acc,
        )


def tree_select(pred, on_true, on_false):
    """Element-wise pytree select on a scalar predicate."""
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false
    )


# --------------------------------------------------------------------- moves
def local_rw_move(problem, local_proposal, key, theta, y, log_kernel_old,
                  support_retries: int = 0):
    """Random-walk Metropolis local move.

    Parity: the local branch shared by all reference samplers
    (``GLMCMC.py:91-104``): symmetric proposal ``theta' = theta + xi``, accept
    with ``log a = log pi(theta') + log K_eps(y') - log pi(theta) -
    log K_eps(y)``.

    The reference's prior-boundary retry loop (``GLMCMC.py:92-93`` — resample
    while the prior reports its out-of-support sentinel) becomes a fixed-shape
    redraw: ``support_retries + 1`` candidate perturbations are drawn at once
    and the first with finite prior mass is used.  With the default
    ``support_retries=0`` an out-of-support proposal is simply rejected
    (equivalent Markov kernel for the priors bundled here).

    Returns ``(theta_new, y_new, log_kernel_new, accepted)``.
    """
    k_prop, k_sim, k_acc = jax.random.split(key, 3)
    n_cand = support_retries + 1
    steps = local_proposal.sample(k_prop, n_cand)            # (n_cand, d)
    cands = theta + steps
    if support_retries > 0:
        finite = jnp.isfinite(problem.prior_log_prob(cands))  # (n_cand,)
        first = jnp.argmax(finite)                            # first True, else 0
        any_ok = jnp.any(finite)
        pick = jnp.where(any_ok, first, n_cand - 1)
        theta_prop = cands[pick]
    else:
        theta_prop = cands[0]

    y_prop = problem.simulate(k_sim, theta_prop)
    log_kernel_prop = problem.kernel_log_prob(problem.discrepancy(y_prop))
    log_acc = (
        problem.prior_log_prob(theta_prop)
        + log_kernel_prop
        - problem.prior_log_prob(theta)
        - log_kernel_old
    )
    log_u = jnp.log(jax.random.uniform(k_acc, ()))
    accepted = log_u < log_acc  # NaN log_acc compares False -> reject
    theta_new = jnp.where(accepted, theta_prop, theta)
    y_new = jnp.where(accepted, y_prop, y)
    log_kernel_new = jnp.where(accepted, log_kernel_prop, log_kernel_old)
    return theta_new, y_new, log_kernel_new, accepted


def isir_move(problem, proposal, key, theta, y, log_kernel_old, batch_size: int):
    """iSIR (iterated sampling-importance-resampling) global move.

    Parity: the iSIR block shared by GLMCMC/GLMALA/GLMCMC-NF/AGLMCMC
    (``GLMCMC.py:66-89``): draw ``batch_size`` proposals, simulate each once,
    weight by ``log pi + log K_eps - log q``, prepend the current state with
    its own weight, and resample one index.  Index 0 means "stay".

    Fixed-shape hygiene: NaN proposal rows (``GLMCMC.py:67-70``) and NaN
    weights (``:80-81``) become ``-inf`` log-weights instead of filtering;
    the Python ``weight_sampling`` inverse-CDF loop becomes a Gumbel-max
    categorical.

    ``proposal`` is anything with ``forward(key, n)`` and ``log_prob(x)`` —
    a parametric distribution, a trained flow, or a fitted KDE.

    Returns ``(theta_new, y_new, log_kernel_new, accepted)``.
    """
    k_prop, k_sim, k_pick = jax.random.split(key, 3)
    with jax.named_scope("isir_propose"):
        theta_prop, log_q = proposal.forward(k_prop, batch_size)  # (B, d), (B,)
        nan_row = jnp.any(jnp.isnan(theta_prop), axis=-1)
        theta_sim = jnp.where(nan_row[:, None], 0.0, theta_prop)
    with jax.named_scope("isir_simulate"):
        x = problem.simulate(k_sim, theta_sim)                    # (B, d_y)
    with jax.named_scope("isir_weigh"):
        log_kernel_prop = problem.kernel_log_prob(problem.discrepancy(x))
        log_w_prop = (problem.prior_log_prob(theta_prop) + log_kernel_prop
                      - log_q)
        log_w_prop = jnp.where(nan_row, -jnp.inf, log_w_prop)
        log_w_old = (
            problem.prior_log_prob(theta) + log_kernel_old
            - proposal.log_prob(theta)
        )
        log_w = jnp.concatenate([log_w_old[None], log_w_prop])    # (B+1,)
    with jax.named_scope("isir_resample"):
        ind = categorical_from_log_weights(k_pick, log_w)
    accepted = ind != 0

    thetas = jnp.concatenate([theta[None], theta_prop])
    ys = jnp.concatenate([y[None], x])
    log_kernels = jnp.concatenate([log_kernel_old[None], log_kernel_prop])
    return thetas[ind], ys[ind], log_kernels[ind], accepted


def independence_mh_move(problem, global_proposal, key, theta, y, log_kernel_old):
    """Independence Metropolis-Hastings global move.

    Parity: GlobalMCMC's global branch (``GlobalMCMC.py:39-53``):
    ``log a = log pi(theta') + log K_eps(y') + log q(theta) - log q(theta')
    - log pi(theta) - log K_eps(y)``.
    """
    k_prop, k_sim, k_acc = jax.random.split(key, 3)
    theta_prop, log_q_prop = global_proposal.forward(k_prop, 1)
    theta_prop, log_q_prop = theta_prop[0], log_q_prop[0]
    y_prop = problem.simulate(k_sim, theta_prop)
    log_kernel_prop = problem.kernel_log_prob(problem.discrepancy(y_prop))
    log_acc = (
        problem.prior_log_prob(theta_prop)
        + log_kernel_prop
        + global_proposal.log_prob(theta)
        - log_q_prop
        - problem.prior_log_prob(theta)
        - log_kernel_old
    )
    log_u = jnp.log(jax.random.uniform(k_acc, ()))
    accepted = log_u < log_acc
    theta_new = jnp.where(accepted, theta_prop, theta)
    y_new = jnp.where(accepted, y_prop, y)
    log_kernel_new = jnp.where(accepted, log_kernel_prop, log_kernel_old)
    return theta_new, y_new, log_kernel_new, accepted


# -------------------------------------------------------------------- driver
@dataclasses.dataclass
class SamplerResult:
    """Host-side result of a (possibly multi-chain) run."""

    thetas: np.ndarray        # (C, T, d) — includes the initial state at t=0
    counts: MoveCounts        # per-chain arrays, shape (C,)
    final_carry: Any

    @property
    def num_chains(self) -> int:
        return self.thetas.shape[0]

    def chain(self, i: int = 0) -> np.ndarray:
        return self.thetas[i]

    def acceptance_rates(self):
        c = self.counts
        tot_att = c.global_attempts + c.local_attempts
        tot_acc = c.global_accepts + c.local_accepts
        with np.errstate(invalid="ignore", divide="ignore"):
            return {
                "global": np.asarray(c.global_accepts / np.maximum(c.global_attempts, 1)),
                "local": np.asarray(c.local_accepts / np.maximum(c.local_attempts, 1)),
                "overall": np.asarray(tot_acc / np.maximum(tot_att, 1)),
            }


def run_segmented(
    step: Callable,
    carry,
    num_steps: int,
    segment_size: int = 10_000,
    on_segment: Optional[Callable[[np.ndarray, int], None]] = None,
    unroll: int = 1,
    checkpoint_path: Optional[str] = None,
    step_offset: int = 0,
    progress: bool = False,
) -> Tuple[Any, np.ndarray]:
    """Run ``num_steps`` scan steps in host-visible segments.

    ``step`` must already be batched over chains (carry leaves have a leading
    chain axis).  Each segment is one jitted ``lax.scan``; its ``(S, C, d)``
    theta block is transferred to host (bounding device memory the way the
    reference bounds host memory with 10k CSV flushes, ``GLMCMC.py:105-111``)
    and optionally handed to ``on_segment(block, start_index)`` for streaming
    IO.  Returns ``(final_carry, thetas (C, num_steps, d))``.
    """

    import functools

    @functools.partial(jax.jit, static_argnames=("length",),
                       donate_argnames=("c",))
    def seg(c, length):
        return jax.lax.scan(step, c, None, length=length, unroll=unroll)

    blocks = []
    done = 0
    t_start = None
    while done < num_steps:
        take = min(segment_size, num_steps - done)
        carry, outs = seg(carry, length=take)
        block = np.asarray(outs.theta)          # (S, C, d)
        block = np.moveaxis(block, 0, 1)        # (C, S, d)
        if on_segment is not None:
            on_segment(block, step_offset + done)
        blocks.append(block)
        done += take
        if checkpoint_path is not None:
            from ..utils.io import save_carry
            save_carry(checkpoint_path, carry, step_offset + done)
        if progress:
            # the reference shows tqdm progress (GlobalMCMC.py:37); here one
            # line per segment with aggregate throughput
            import sys as _sys
            import time as _time
            now = _time.time()
            if t_start is None:
                t_start = now
                rate = 0.0
            else:
                rate = done * block.shape[0] / max(now - t_start, 1e-9)
            print(f"\r[{step_offset + done}/{step_offset + num_steps}] "
                  f"{rate:,.0f} transitions/s", end="", file=_sys.stderr)
            if done >= num_steps:
                print(file=_sys.stderr)
    thetas = np.concatenate(blocks, axis=1) if blocks else np.zeros((0, 0, 0))
    return carry, thetas
