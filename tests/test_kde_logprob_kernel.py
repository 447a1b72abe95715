"""Batched KDE log-density kernel: exact CPU (interpret) parity tests.

The kernel is RNG-free, so unlike the transition kernels it is fully
validated off-hardware: interpret mode must reproduce the vmapped
``KernelDensity.log_prob`` to reduction-order tolerance on arbitrary
weighted supports, including zero-weight (masked) rows and support padding.
"""

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu.models.kde import KernelDensity
from glabc_tpu.ops.pallas.kde_logprob_kernel import batched_kde_log_prob

KEY = jax.random.PRNGKey(0)


def _batched_kde(C, P, d, seed=0, mask_frac=0.25):
    rng = np.random.RandomState(seed)
    X = rng.randn(C, P, d).astype(np.float32)
    w = rng.rand(C, P).astype(np.float32)
    w[rng.rand(C, P) < mask_frac] = 0.0
    return jax.vmap(lambda x, ww: KernelDensity.fit(x, ww))(
        jnp.asarray(X), jnp.asarray(w))


class TestKernelParity:
    def _check(self, C, P, N, d, chunk=512, atol=2e-4):
        kdes = _batched_kde(C, P, d)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(C, N, d).astype(np.float32) * 1.5)
        got = np.asarray(batched_kde_log_prob(kdes, x, point_chunk=chunk,
                                              interpret=True))
        want = np.asarray(jax.vmap(lambda k, xx: k.log_prob(xx))(kdes, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=atol)

    def test_canonical_shape(self):
        # pool-sized: P=1000 support (padded to 1024), P points
        self._check(C=128, P=250, N=250, d=2)

    def test_unpadded_pow2(self):
        self._check(C=128, P=256, N=128, d=2)

    def test_high_dim(self):
        self._check(C=128, P=200, N=64, d=8)

    def test_odd_dim(self):
        self._check(C=128, P=130, N=40, d=3)

    def test_small_chunk_streaming(self):
        self._check(C=128, P=384, N=96, d=2, chunk=128)

    def test_multiblock_chains(self):
        self._check(C=256, P=130, N=40, d=2)

    def test_far_points_no_overflow(self):
        """Points far outside the support: all mixture terms underflow;
        result must stay finite-or--inf consistently with the XLA path."""
        kdes = _batched_kde(128, 64, 2)
        x = jnp.full((128, 16, 2), 60.0)
        got = np.asarray(batched_kde_log_prob(kdes, x, interpret=True))
        want = np.asarray(jax.vmap(lambda k, xx: k.log_prob(xx))(kdes, x))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-3)


def test_kernel_lowers_for_tpu():
    from jax import export

    kdes = _batched_kde(128, 130, 2)
    x = jnp.zeros((128, 40, 2))
    export.export(
        jax.jit(lambda k, xx: batched_kde_log_prob(k, xx)),
        platforms=["tpu"])(kdes, x)


def test_epoch_pallas_backend_matches_xla():
    """make_epoch_fn(logprob_backend='pallas') must reproduce the XLA
    epoch to reduction-order tolerance (same keys => same candidates/KDEs;
    only the redrawn pool's log_q differs by ~1e-4, which propagates into
    log_w)."""
    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.samplers.aglmcmc import (AGLMCMCConfig,
                                            _pool_from_proposals,
                                            make_epoch_fn)

    prob = MixtureProblem(0.05)
    ip = DiagGaussian.create(2, 0.0, 0.0)
    cfg = AGLMCMCConfig(1.0, 2, 16, 0.8, 0.2, 4, 0, 0)
    C, P = 128, 32
    key = jax.random.PRNGKey(5)

    def init_pools(k):
        def one(kk):
            k1, k2 = jax.random.split(kk)
            th, log_q = ip.forward(k1, P)
            return _pool_from_proposals(prob, k2, th, log_q)
        return jax.vmap(one)(jax.random.split(k, C))

    keys = jax.random.split(jax.random.PRNGKey(7), C)
    f_xla = make_epoch_fn(prob, cfg, C, logprob_backend="xla")
    f_pal = make_epoch_fn(prob, cfg, C, logprob_backend="pallas",
                          interpret=True)
    # pools AND hat_eps are donated: fresh arrays per call
    pa, ka, ea = f_xla(keys, init_pools(key),
                       jnp.full((C,), 1.0e6, jnp.float32))
    pb, kb, eb = f_pal(keys, init_pools(key),
                       jnp.full((C,), 1.0e6, jnp.float32))
    np.testing.assert_array_equal(np.asarray(pa.theta), np.asarray(pb.theta))
    np.testing.assert_array_equal(np.asarray(ea), np.asarray(eb))
    np.testing.assert_allclose(np.asarray(pa.log_q), np.asarray(pb.log_q),
                               rtol=1e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ka.weights),
                               np.asarray(kb.weights), rtol=1e-6, atol=1e-7)
