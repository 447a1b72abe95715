"""Whole-stack Pallas coupling-flow kernel vs the XLA flow (interpret mode
on CPU; the kernel has no in-kernel PRNG, so interpret results are exact
modulo f32 matmul rounding)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from glabc_tpu.models.flows import CouplingFlow
from glabc_tpu.ops.pallas.flow_kernel import (
    FusedCouplingFlow,
    flow_pull_fused,
    flow_push_fused,
)


def _trained_flow(dim=2, n_layers=4, hidden=32, steps=25):
    # lr 3e-3 + zero-mean data: the original fixture (lr 1e-2, means up
    # to dim-1) trained the dim=8 flow into near-overflow exp scalings —
    # finite on CPU, NaN/inf under TPU matmul accumulation order.  First
    # caught when the hardware-gated tests actually ran on a chip (r5);
    # the fixture only needs non-trivial weights, not an aggressive fit.
    flow = CouplingFlow.create(jax.random.PRNGKey(0), dim, n_layers, hidden)
    opt = optax.adam(3e-3)
    st = opt.init(flow)
    data = (jax.random.normal(jax.random.PRNGKey(1), (256, dim)) * 1.5
            + 0.5)
    for _ in range(steps):
        g = jax.grad(lambda f: f.forward_kld(data))(flow)
        up, st = opt.update(g, st)
        flow = optax.apply_updates(flow, up)
    return flow


@pytest.mark.slow
class TestFlowKernelParity:
    @pytest.mark.parametrize("dim", [2, 3, 8])
    def test_push_matches_xla(self, dim):
        flow = _trained_flow(dim=dim)
        z = jax.random.normal(jax.random.PRNGKey(2), (dim, 256))
        x_ref, s_ref = flow.push_t(z)
        x_k, s_k = flow_push_fused(flow, z, block_rows=128, interpret=True)
        np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                                   atol=2e-5, rtol=1e-5)

    @pytest.mark.parametrize("dim", [2, 3, 8])
    def test_pull_inverts_push(self, dim):
        flow = _trained_flow(dim=dim)
        z = jax.random.normal(jax.random.PRNGKey(3), (dim, 128))
        x_k, s_fwd = flow_push_fused(flow, z, block_rows=128, interpret=True)
        z_back, s_inv = flow_pull_fused(flow, x_k, block_rows=128,
                                        interpret=True)
        np.testing.assert_allclose(np.asarray(z_back), np.asarray(z),
                                   atol=5e-5, rtol=1e-4)
        # log-det of the inverse pass equals the forward pass
        np.testing.assert_allclose(np.asarray(s_inv), np.asarray(s_fwd),
                                   atol=5e-5, rtol=1e-4)

    def test_log_prob_assembly(self):
        """base.log_prob(pull(x)) - s == flow.log_prob(x)."""
        flow = _trained_flow()
        x = jax.random.normal(jax.random.PRNGKey(4), (256, 2)) * 2.0
        ref = flow.log_prob(x)
        z_t, s = flow_pull_fused(flow, x.T, block_rows=128, interpret=True)
        got = flow.base.log_prob(z_t.T) - s
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=1e-5)

    def test_kernel_cache_hits_by_value(self):
        a = FusedCouplingFlow(2, 4, 32, block_rows=128)
        b = FusedCouplingFlow(2, 4, 32, block_rows=128)
        assert a == b and hash(a) == hash(b)
        c = FusedCouplingFlow(2, 4, 32, block_rows=128,
                              matmul_dtype="bfloat16")
        assert a != c

    def test_bf16_accuracy_band(self):
        """bf16 matmuls: log-scale sum within ~1e-2 of f32 (proposal-density
        grade, documented in the kernel module docstring)."""
        flow = _trained_flow()
        z = jax.random.normal(jax.random.PRNGKey(5), (2, 256))
        _, s_ref = flow.push_t(z)
        x_k, s_k = flow_push_fused(flow, z, block_rows=128,
                                   matmul_dtype="bfloat16", interpret=True)
        assert float(jnp.abs(s_k - s_ref).max()) < 5e-2
        assert np.all(np.isfinite(np.asarray(x_k)))


@pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="real-hardware Mosaic lowering check (interpret mode cannot see "
           "unsupported primitives, e.g. the .at[].set -> scatter pad that "
           "broke this kernel on-chip in round 4)",
)
class TestFlowKernelHardware:
    """Compiled (non-interpret) kernel vs the XLA flow on the real chip."""

    @pytest.mark.parametrize("dim", [2, 8])
    def test_push_pull_match_xla_on_tpu(self, dim):
        """On hardware the kernel and XLA flows legitimately diverge at
        the f32 matmul-accumulation level, AMPLIFIED layer-by-layer
        through the trained exp-scalings (measured ~6e-3 absolute at 4
        layers; the CPU-interpret tolerance of 5e-5 does not transfer).
        The roundtrip check is therefore self-calibrating: the kernel's
        pull(push(z)) error must stay within the same order as the XLA
        flow's OWN roundtrip error (the transform's intrinsic
        conditioning; measured ratios 0.13x-2.3x depending on fixture)."""
        flow = _trained_flow(dim=dim)
        z = jax.random.normal(jax.random.PRNGKey(7), (dim, 2048))
        x_ref, s_ref = flow.push_t(z)
        assert np.all(np.isfinite(np.asarray(x_ref))), (
            "fixture flow overflows on the XLA path — retune _trained_flow")
        x_k, s_k = flow_push_fused(flow, z, block_rows=1024)
        assert np.all(np.isfinite(np.asarray(x_k)))
        np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_ref),
                                   atol=2e-2, rtol=1e-2)
        np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                                   atol=1e-2, rtol=1e-2)

        def max_rel(a, b):
            return float(jnp.max(jnp.abs(a - b) / (jnp.abs(b) + 1e-4)))

        z_k, s_inv_k = flow_pull_fused(flow, x_k, block_rows=1024)
        z_x, s_inv_x = flow.pull_t(x_ref)
        kernel_rt = max_rel(z_k, z)
        xla_rt = max_rel(z_x, z)
        # factor 4: measured ratios swing both ways with the fixture's
        # conditioning (kernel/xla was 0.13x on the aggressive fixture,
        # 2.3x on the tame one) — same order of magnitude is the claim
        assert kernel_rt < max(4.0 * xla_rt, 2e-3), (kernel_rt, xla_rt)
        assert max_rel(s_inv_k, s_k) < max(4.0 * max_rel(s_inv_x, s_ref),
                                           2e-3)
