"""Pallas TPU kernels: the fused transition hot path.

* ``mixture_kernel`` — fused GLMCMC/GlobalMCMC transitions, state laid out
  ``(d_pad, C)`` (general d).
* ``packed_kernel`` — sublane-packed variant for ``d | 8``: ``8/d`` chains
  per sublane group, every row live.
"""

from .mixture_kernel import FusedMixtureGLMCMC, FusedStats, fused_state_init
from .packed_kernel import (
    PackedMixtureGLMCMC,
    packed_state_init,
    unpack_history,
)

__all__ = [
    "FusedMixtureGLMCMC",
    "FusedStats",
    "fused_state_init",
    "PackedMixtureGLMCMC",
    "packed_state_init",
    "unpack_history",
]
