"""Tracing / profiling / debug hooks (SURVEY §5: absent in the reference).

* :func:`annotate` — named trace scopes around sampler phases
  (propose/simulate/weigh/resample/refit) that show up in XLA/perfetto
  profiles;
* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard/perfetto trace directory;
* :func:`debug_mode` — dev-mode switches: NaN checking
  (``jax_debug_nans``) and x64, restored on exit.
"""

from __future__ import annotations

import contextlib

import jax

__all__ = ["annotate", "trace", "debug_mode"]


def annotate(name: str):
    """Named profiler scope: ``with annotate('simulate'): ...`` (also works
    inside jitted code via ``jax.named_scope``)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(log_dir: str, *, host_tracer_level: int = 2):
    """Capture a device+host profile of the enclosed block.

    View with TensorBoard's profile plugin or ``perfetto`` (the trace is
    written under ``log_dir/plugins/profile/...``).
    """
    jax.profiler.start_trace(log_dir, create_perfetto_trace=True)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_mode(nans: bool = True, x64: bool = False):
    """Dev-mode numerics: raise on NaN production inside jit, optionally
    enable float64.  Restores previous flags on exit."""
    prev_nans = jax.config.jax_debug_nans
    prev_x64 = jax.config.jax_enable_x64
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_enable_x64", x64)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_enable_x64", prev_x64)
