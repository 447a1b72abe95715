from .distributions import Uniform, Gamma, DiagGaussian, GaussianMixture
from .kde import KernelDensity
from .problems import (ABCProblem, GKProblem, HighDimMixtureProblem,
                       MA2Problem, MixtureProblem)

__all__ = [
    "Uniform",
    "Gamma",
    "DiagGaussian",
    "GaussianMixture",
    "KernelDensity",
    "ABCProblem",
    "GKProblem",
    "MA2Problem",
    "MixtureProblem",
    "HighDimMixtureProblem",
]
