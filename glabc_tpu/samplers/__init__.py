from .base import MoveCounts, SamplerResult, StepOut, isir_move, local_rw_move
from .chain import ChainCarry, init_chain_carry, sample_with_step
from .global_mcmc import GlobalMCMCConfig, build_global_mcmc_step, run_global_mcmc
from .glmcmc import GLMCMCConfig, build_glmcmc_step, run_glmcmc
from .aglmcmc_fused import run_aglmcmc_fused
from .glmcmc_nf_fused import run_glmcmc_nf_fused, run_glmcmc_nf_pooled
from .glmala_fused import run_glmala_fused
from .glmcmc_fused import run_glmcmc_fused, run_global_mcmc_fused
from .fused_program import run_fused_program

__all__ = [
    "MoveCounts",
    "SamplerResult",
    "StepOut",
    "isir_move",
    "local_rw_move",
    "ChainCarry",
    "init_chain_carry",
    "sample_with_step",
    "GlobalMCMCConfig",
    "build_global_mcmc_step",
    "run_global_mcmc",
    "GLMCMCConfig",
    "build_glmcmc_step",
    "run_glmcmc",
    "run_glmcmc_fused",
    "run_global_mcmc_fused",
    "run_fused_program",
    "run_glmala_fused",
    "run_aglmcmc_fused",
    "run_glmcmc_nf_pooled",
    "run_glmcmc_nf_fused",
]
