"""glabc_tpu — a TPU-native likelihood-free inference engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference GL-ABC-MCMC package (global-local ABC-MCMC samplers, distribution
library, weighted KDE, ESJD diagnostics, runner facade), re-designed
TPU-first: samplers are jit-compiled ``lax.scan`` kernels vmapped over
thousands of chains, sharded across device meshes with ``shard_map``, with
normalizing-flow / KDE proposal adaptation running on-device.
"""

from .models import (
    ABCProblem,
    GKProblem,
    DiagGaussian,
    Gamma,
    GaussianMixture,
    HighDimMixtureProblem,
    KernelDensity,
    MA2Problem,
    MixtureProblem,
    Uniform,
)
from .models.flows import CouplingFlow
from .ops import chain_summary, esjd, esjd_per_second, rhat
from .runner import MCMCRunner
from .samplers.aglmcmc import run_aglmcmc
from .samplers.aglmcmc_fused import run_aglmcmc_fused
from .samplers.glmala import run_glmala
from .samplers.glmcmc import run_glmcmc
from .samplers.glmcmc_nf import run_glmcmc_nf
from .samplers.glmcmc_nf_fused import run_glmcmc_nf_fused, run_glmcmc_nf_pooled
from .samplers.global_mcmc import run_global_mcmc
from .utils import ChainWriter, load_carry, save_carry

__version__ = "0.1.0"

__all__ = [
    "MCMCRunner",
    "CouplingFlow",
    "ChainWriter",
    "load_carry",
    "save_carry",
    "run_global_mcmc",
    "run_glmcmc",
    "run_glmala",
    "run_glmcmc_nf",
    "run_glmcmc_nf_pooled",
    "run_glmcmc_nf_fused",
    "run_aglmcmc",
    "run_aglmcmc_fused",
    "ABCProblem",
    "GKProblem",
    "DiagGaussian",
    "Gamma",
    "GaussianMixture",
    "HighDimMixtureProblem",
    "KernelDensity",
    "MA2Problem",
    "MixtureProblem",
    "Uniform",
    "chain_summary",
    "esjd",
    "esjd_per_second",
    "rhat",
    "__version__",
]
