"""GlobalMCMC: parametric independence-MH global move + random-walk local.

Capability parity with reference ``glabcmcmc/GlobalMCMC.py:6-98``, re-built
as a jit + ``lax.scan`` transition kernel vmapped over chains.  The
per-iteration Bernoulli(global_frequency) coin flip (``GlobalMCMC.py:39``)
becomes ``lax.cond``.
"""

from __future__ import annotations

import dataclasses

import jax

from .base import StepOut, independence_mh_move, local_rw_move
from .chain import ChainCarry, sample_with_step

__all__ = ["GlobalMCMCConfig", "build_global_mcmc_step", "run_global_mcmc"]


@dataclasses.dataclass(frozen=True)
class GlobalMCMCConfig:
    global_frequency: float = 0.5
    support_retries: int = 0


def build_global_mcmc_step(problem, global_proposal, local_proposal,
                           cfg: GlobalMCMCConfig):
    """Per-chain transition kernel.  Returns ``step(carry, _)``."""
    gf = cfg.global_frequency

    def step(carry: ChainCarry, _):
        key, k_coin, k_move = jax.random.split(carry.key, 3)
        is_global = jax.random.uniform(k_coin, ()) < gf

        def do_global(k):
            return independence_mh_move(
                problem, global_proposal, k, carry.theta, carry.y, carry.log_kernel
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


def run_global_mcmc(problem, key, num_ite, theta0, global_proposal,
                    local_proposal, global_frequency=0.5, y0=None,
                    num_chains: int = 1, segment_size: int = 10_000,
                    on_segment=None, support_retries: int = 0,
                    checkpoint_path=None, resume: bool = False, mesh=None):
    cfg = GlobalMCMCConfig(global_frequency, support_retries)
    step = build_global_mcmc_step(problem, global_proposal, local_proposal, cfg)
    return sample_with_step(
        problem, step, key, num_ite, theta0, y0, num_chains,
        segment_size, on_segment, checkpoint_path=checkpoint_path,
        resume=resume, mesh=mesh,
    )
