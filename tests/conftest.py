"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX fake-multi-device pattern (SURVEY.md §4): collective
code paths (psum/all_gather resampling, distributed quantiles, pooled refits)
are exercised in CI without TPU hardware.

Gotcha: this image's sitecustomize imports jax at interpreter startup (to
register the axon TPU backend) and sets JAX_PLATFORMS=axon,cpu, so env vars
set here are too late — the platform must be forced through
``jax.config.update``.  Without this, tests serialize on the single tunneled
TPU chip and contend with any concurrent TPU process.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# GLABC_TPU_TESTS=1 keeps the real backend so the TPU-gated tests
# (tests/test_fused_kernel.py) run on hardware:
#   GLABC_TPU_TESTS=1 python -m pytest tests/test_fused_kernel.py -q
# (one TPU process at a time — don't run concurrently with bench.py).
if not os.environ.get("GLABC_TPU_TESTS"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
