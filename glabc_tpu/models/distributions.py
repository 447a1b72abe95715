"""TPU-native probability distribution library.

Capability parity with the reference distribution module
(``glabcmcmc/distribution.py``: Uniform :50, Gamma :90, DiagGaussian :143,
GaussianMixture :206), re-designed as stateless JAX pytrees:

* every distribution is a frozen dataclass registered as a pytree, so it can
  be closed over by ``jit``, carried through ``lax.scan``, vmapped, sharded,
  and (for :class:`GaussianMixture`) trained with optax;
* sampling takes an explicit PRNG ``key`` (no global RNG state);
* all methods are batch-first and broadcast over leading axes — there is a
  single canonical batch layout instead of the reference's per-shape dispatch;
* ``Gamma`` uses ``jax.random.gamma`` + ``jax.scipy.stats`` instead of the
  reference's scipy/numpy round-trip (``distribution.py:104-137``), so it is
  jittable and differentiable.

The common interface mirrors the reference ``BaseDistribution`` contract
(``distribution.py:7-48``):

* ``forward(key, num_samples) -> (z, log_p)`` — samples plus their log-density
* ``log_prob(z) -> (...,)`` — log-density of a batch ``(..., d)``
* ``sample(key, num_samples) -> z`` — samples only
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "Uniform",
    "Gamma",
    "DiagGaussian",
    "GaussianMixture",
]

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def _as_1d(x, dim=None) -> jnp.ndarray:
    """Coerce scalars / nested shapes to a flat float32 event vector."""
    arr = jnp.asarray(x, dtype=jnp.float32).reshape(-1)
    if dim is not None and arr.shape[0] == 1 and dim > 1:
        arr = jnp.broadcast_to(arr, (dim,))
    return arr


def _pytree_dataclass(cls):
    """Register a frozen dataclass whose fields are all array leaves."""
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class Uniform:
    """Axis-aligned box uniform distribution on ``[low, high]^d``.

    Parity: reference ``Uniform`` (``distribution.py:50-86``) — constant
    log-density inside the box; any coordinate out of range makes the whole
    row ``-inf`` (``distribution.py:81-86``).
    """

    low: jnp.ndarray   # (d,)
    high: jnp.ndarray  # (d,)

    @classmethod
    def create(cls, dim: int, low=-2.0, high=2.0) -> "Uniform":
        return cls(low=_as_1d(low, dim), high=_as_1d(high, dim))

    @property
    def dim(self) -> int:
        return self.low.shape[-1]

    @property
    def _log_prob_const(self) -> jnp.ndarray:
        return -jnp.sum(jnp.log(self.high - self.low), axis=-1)

    def sample(self, key, num_samples: int = 1) -> jnp.ndarray:
        eps = jax.random.uniform(key, (num_samples, self.dim), dtype=self.low.dtype)
        return self.low + (self.high - self.low) * eps

    def log_prob(self, z) -> jnp.ndarray:
        z = jnp.asarray(z)
        inside = jnp.all((z >= self.low) & (z <= self.high), axis=-1)
        return jnp.where(inside, self._log_prob_const, -jnp.inf)

    def forward(self, key, num_samples: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.sample(key, num_samples)
        log_p = jnp.full((num_samples,), self._log_prob_const, dtype=z.dtype)
        return z, log_p


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class Gamma:
    """Independent multivariate Gamma distribution.

    Parity: reference ``Gamma`` (``distribution.py:90-137``), which round-trips
    through ``scipy.stats.gamma`` and is therefore CPU-only and
    non-differentiable.  Here: ``jax.random.gamma`` for sampling and the
    closed-form log-density, summed over the event dimension, with ``-inf``
    outside the support (matching ``np.where(p > 0, log p, -inf)`` at
    ``distribution.py:136``).
    """

    concentration: jnp.ndarray  # (d,)  "Shape" in the reference
    rate: jnp.ndarray           # (d,)  "Rate" (1/scale) in the reference

    @classmethod
    def create(cls, concentration, rate) -> "Gamma":
        return cls(concentration=_as_1d(concentration), rate=_as_1d(rate))

    @property
    def dim(self) -> int:
        return self.concentration.shape[-1]

    def sample(self, key, num_samples: int = 1) -> jnp.ndarray:
        g = jax.random.gamma(
            key, self.concentration, (num_samples, self.dim), dtype=jnp.float32
        )
        return g / self.rate

    def log_prob(self, z) -> jnp.ndarray:
        z = jnp.asarray(z, dtype=jnp.float32)
        a = self.concentration
        # log Gamma(z; a, rate) = a*log(rate) + (a-1)*log z - rate*z - lgamma(a)
        valid = z > 0
        zs = jnp.where(valid, z, 1.0)  # avoid nan in log for masked entries
        per_dim = (
            a * jnp.log(self.rate)
            + (a - 1.0) * jnp.log(zs)
            - self.rate * zs
            - jax.lax.lgamma(a)
        )
        per_dim = jnp.where(valid, per_dim, -jnp.inf)
        return jnp.sum(per_dim, axis=-1)

    def forward(self, key, num_samples: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.sample(key, num_samples)
        return z, self.log_prob(z)


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class DiagGaussian:
    """Multivariate Gaussian with diagonal covariance.

    Parity: reference ``DiagGaussian`` (``distribution.py:143-203``) including
    the joint independent ``cdf`` (``:183-200``).  The ``register_buffer``
    no-op stub in the reference exists only to satisfy normflows; a JAX pytree
    needs no such shim.
    """

    loc: jnp.ndarray        # (d,)
    log_scale: jnp.ndarray  # (d,)

    @classmethod
    def create(cls, dim: int, loc=0.0, log_scale=0.0) -> "DiagGaussian":
        return cls(loc=_as_1d(loc, dim), log_scale=_as_1d(log_scale, dim))

    @property
    def dim(self) -> int:
        return self.loc.shape[-1]

    def sample(self, key, num_samples: int = 1) -> jnp.ndarray:
        eps = jax.random.normal(key, (num_samples, self.dim), dtype=self.loc.dtype)
        return self.loc + jnp.exp(self.log_scale) * eps

    def log_prob(self, z) -> jnp.ndarray:
        z = jnp.asarray(z)
        eps = (z - self.loc) / jnp.exp(self.log_scale)
        return -0.5 * self.dim * _LOG_2PI - jnp.sum(
            self.log_scale + 0.5 * jnp.square(eps), axis=-1
        )

    def forward(self, key, num_samples: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        eps = jax.random.normal(key, (num_samples, self.dim), dtype=self.loc.dtype)
        z = self.loc + jnp.exp(self.log_scale) * eps
        log_p = -0.5 * self.dim * _LOG_2PI - jnp.sum(
            self.log_scale + 0.5 * jnp.square(eps), axis=-1
        )
        return z, log_p

    def cdf(self, z) -> jnp.ndarray:
        """Joint independent CDF: product of per-coordinate normal CDFs."""
        z = jnp.asarray(z)
        std = jnp.exp(self.log_scale)
        per_dim = jax.scipy.stats.norm.cdf(z, loc=self.loc, scale=std)
        return jnp.prod(per_dim, axis=-1)


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianMixture:
    """Mixture of diagonal-covariance Gaussians with trainable parameters.

    Parity: reference ``GaussianMixture`` (``distribution.py:206-293``).
    Because this is a pytree of arrays, the parameters (``loc``, ``log_scale``,
    ``weight_logits``) can be optimized directly with optax — the JAX
    equivalent of the reference's ``nn.Parameter`` fields.  The reference's
    ``dim == 1`` special case (``:275-282``) is subsumed by generic
    broadcasting.
    """

    loc: jnp.ndarray           # (K, d)
    log_scale: jnp.ndarray     # (K, d)
    weight_logits: jnp.ndarray  # (K,)  softmax-normalized mode weights

    @classmethod
    def create(cls, n_modes: int, dim: int, loc=None, scale=None, weights=None,
               key=None) -> "GaussianMixture":
        if loc is None:
            if key is None:
                key = jax.random.PRNGKey(0)
            loc = jax.random.normal(key, (n_modes, dim))
        loc = jnp.asarray(loc, jnp.float32).reshape(n_modes, dim)
        if scale is None:
            scale = jnp.ones((n_modes, dim))
        scale = jnp.asarray(scale, jnp.float32).reshape(n_modes, dim)
        if weights is None:
            weights = jnp.ones((n_modes,))
        weights = jnp.asarray(weights, jnp.float32).reshape(n_modes)
        weights = weights / jnp.sum(weights)
        return cls(loc=loc, log_scale=jnp.log(scale), weight_logits=jnp.log(weights))

    @property
    def n_modes(self) -> int:
        return self.loc.shape[-2]

    @property
    def dim(self) -> int:
        return self.loc.shape[-1]

    def _log_weights(self) -> jnp.ndarray:
        return jax.nn.log_softmax(self.weight_logits, axis=-1)

    def log_prob(self, z) -> jnp.ndarray:
        z = jnp.asarray(z)
        # (..., 1, d) vs (K, d)
        eps = (z[..., None, :] - self.loc) / jnp.exp(self.log_scale)
        log_p = (
            -0.5 * self.dim * _LOG_2PI
            + self._log_weights()
            - 0.5 * jnp.sum(jnp.square(eps), axis=-1)
            - jnp.sum(self.log_scale, axis=-1)
        )
        return jax.scipy.special.logsumexp(log_p, axis=-1)

    def sample(self, key, num_samples: int = 1) -> jnp.ndarray:
        k_mode, k_eps = jax.random.split(key)
        mode = jax.random.categorical(k_mode, self.weight_logits, shape=(num_samples,))
        eps = jax.random.normal(k_eps, (num_samples, self.dim), dtype=self.loc.dtype)
        loc = self.loc[mode]                 # (n, d)
        scale = jnp.exp(self.log_scale)[mode]
        return loc + scale * eps

    def forward(self, key, num_samples: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        z = self.sample(key, num_samples)
        return z, self.log_prob(z)
