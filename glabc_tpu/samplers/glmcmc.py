"""GLMCMC: iSIR global move + random-walk local move.

Capability parity with reference ``glabcmcmc/GLMCMC.py:24-137``, re-built as
a jit + ``lax.scan`` kernel vmapped over chains.

Design notes vs the reference:

* the reference caches the current state's log-weight and recomputes it only
  after an accepted local move (the ``local`` flag, ``GLMCMC.py:50,60-65``).
  The cached value is a pure function of ``(theta, y)`` for a fixed
  importance proposal, so here it is recomputed inside :func:`isir_move`
  from the carried ``(theta, y, log_kernel)`` — mathematically identical,
  branch-free, and correct even when the proposal changes between steps
  (which the NF/KDE samplers need);
* NaN-proposal filtering and the Python ``weight_sampling`` loop are replaced
  by masked log-weights + Gumbel-max (see ``glabc_tpu.ops.resampling``).
"""

from __future__ import annotations

import dataclasses

import jax

from .base import StepOut, isir_move, local_rw_move
from .chain import ChainCarry, sample_with_step

__all__ = ["GLMCMCConfig", "build_glmcmc_step", "run_glmcmc"]


@dataclasses.dataclass(frozen=True)
class GLMCMCConfig:
    global_frequency: float = 0.9
    batch_size: int = 5
    support_retries: int = 0


def build_glmcmc_step(problem, importance_proposal, local_proposal,
                      cfg: GLMCMCConfig):
    """Per-chain transition kernel.  Returns ``step(carry, _)``."""
    gf = cfg.global_frequency

    def step(carry: ChainCarry, _):
        key, k_coin, k_move = jax.random.split(carry.key, 3)
        is_global = jax.random.uniform(k_coin, ()) < gf

        def do_global(k):
            return isir_move(
                problem, importance_proposal, k, carry.theta, carry.y,
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


def run_glmcmc(problem, key, num_ite, theta0, importance_proposal,
               local_proposal, global_frequency=0.9, batch_size=5, y0=None,
               num_chains: int = 1, segment_size: int = 10_000,
               on_segment=None, support_retries: int = 0,
               checkpoint_path=None, resume: bool = False, mesh=None):
    cfg = GLMCMCConfig(global_frequency, batch_size, support_retries)
    step = build_glmcmc_step(problem, importance_proposal, local_proposal, cfg)
    return sample_with_step(
        problem, step, key, num_ite, theta0, y0, num_chains,
        segment_size, on_segment, checkpoint_path=checkpoint_path,
        resume=resume, mesh=mesh,
    )
