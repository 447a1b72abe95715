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
    DiagGaussian,
    Gamma,
    GaussianMixture,
    HighDimMixtureProblem,
    KernelDensity,
    MixtureProblem,
    Uniform,
)
from .ops import chain_summary, esjd, esjd_per_second

__version__ = "0.1.0"

__all__ = [
    "ABCProblem",
    "DiagGaussian",
    "Gamma",
    "GaussianMixture",
    "HighDimMixtureProblem",
    "KernelDensity",
    "MixtureProblem",
    "Uniform",
    "chain_summary",
    "esjd",
    "esjd_per_second",
    "__version__",
]
