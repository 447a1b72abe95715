from .distributions import Uniform, Gamma, DiagGaussian, GaussianMixture
from .kde import KernelDensity
from .problems import ABCProblem, MixtureProblem, HighDimMixtureProblem

__all__ = [
    "Uniform",
    "Gamma",
    "DiagGaussian",
    "GaussianMixture",
    "KernelDensity",
    "ABCProblem",
    "MixtureProblem",
    "HighDimMixtureProblem",
]
