"""Config-value hashing for the fused kernel classes.

The kernel ``run`` methods are ``jax.jit(..., static_argnums=(0,))`` — the
kernel object itself is a static argument, so jit's compilation cache is
keyed on its ``__hash__``/``__eq__``.  Python's defaults are object
*identity*, which means constructing a fresh kernel (as every
``run_*_fused`` driver call does) is a guaranteed cache miss and a full
~20-40 s Mosaic recompile even for an identical configuration.

:class:`ConfigHashable` keys the cache on the kernel's *configuration*
instead: every attribute set in ``__init__`` (all plain scalars, strings,
or numpy arrays).  Two kernels built with the same parameters then share
one compiled executable for the whole process lifetime — repeated driver
calls, benchmarks, and test suites stop paying per-call recompiles.
"""

from __future__ import annotations

import numpy as np

__all__ = ["ConfigHashable"]


def _freeze(v):
    if isinstance(v, np.ndarray):
        return ("ndarray", v.shape, v.dtype.str, v.tobytes())
    if isinstance(v, (list, tuple)):
        return tuple(_freeze(x) for x in v)
    return v


class ConfigHashable:
    """Value-semantics ``__hash__``/``__eq__`` over ``self.__dict__``."""

    def _config_key(self):
        return (type(self),
                tuple((k, _freeze(v))
                      for k, v in sorted(self.__dict__.items())))

    def __hash__(self):
        return hash(self._config_key())

    def __eq__(self, other):
        return (type(self) is type(other)
                and self._config_key() == other._config_key())
