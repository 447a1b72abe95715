"""ABC problem DSL: the TPU-native formulation of the reference "ABCset".

The reference defines problems by duck-typed convention (attrs ``epsilon``,
``theta_dim``, ``y_obs``, ``y_dim``; methods ``generate_samples``,
``prior_log_prob``, ``discrepancy``, ``calculate_log_kernel``,
``calculate_log_kernel_dis`` — see ``examples/Mixture.py:5-53`` and
``README.md:66-104``).  Here the contract is an explicit base class of *pure,
key-threaded, batch-first* functions:

* ``simulate(key, theta) -> y``    — theta ``(..., d_theta)`` -> ``(..., d_y)``
  (one simulated dataset per theta; the reference's triple shape dispatch at
  ``Mixture.py:20-25`` collapses to broadcasting)
* ``prior_log_prob(theta) -> (...,)``
* ``discrepancy(y) -> (...,)``     — distance of simulated data to ``y_obs``
* ``kernel_log_prob(dis, epsilon=None) -> (...,)`` — the epsilon-kernel
  evaluated on precomputed discrepancies (reference
  ``calculate_log_kernel_dis``); ``epsilon`` may be a traced array, which is
  what AGLMCMC's annealing needs.

Reference-style aliases (``generate_samples``, ``calculate_log_kernel``,
``calculate_log_kernel_dis``) are provided so problem definitions read the
same for users switching over.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ABCProblem", "MixtureProblem", "HighDimMixtureProblem",
           "GKProblem", "MA2Problem"]

_LOG_2PI = jnp.log(2.0 * jnp.pi)


def _gaussian_kernel_log_prob(dis: jnp.ndarray, epsilon) -> jnp.ndarray:
    """log N(dis; 0, epsilon^2) — the reference epsilon-kernel
    (``Mixture.py:38-53``)."""
    epsilon = jnp.asarray(epsilon, jnp.float32)
    return -0.5 * _LOG_2PI - jnp.log(epsilon) - 0.5 * jnp.square(dis / epsilon)


class ABCProblem:
    """Base class for ABC problems.  Subclasses must set ``epsilon``,
    ``theta_dim``, ``y_obs`` (shape ``(y_dim,)``) and implement ``simulate``,
    ``prior_log_prob`` and ``discrepancy``.  ``kernel_log_prob`` defaults to
    the Gaussian epsilon-kernel used throughout the reference."""

    epsilon: float
    theta_dim: int
    y_obs: jnp.ndarray

    @property
    def y_dim(self) -> int:
        return int(self.y_obs.shape[-1])

    # ---- abstract ------------------------------------------------------
    def simulate(self, key, theta: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def prior_log_prob(self, theta: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def discrepancy(self, y: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    # ---- defaults ------------------------------------------------------
    def kernel_log_prob(self, dis: jnp.ndarray, epsilon=None) -> jnp.ndarray:
        if epsilon is None:
            epsilon = self.epsilon
        return _gaussian_kernel_log_prob(dis, epsilon)

    def log_kernel_of_y(self, y: jnp.ndarray, epsilon=None) -> jnp.ndarray:
        """kernel_log_prob(discrepancy(y)) — reference ``calculate_log_kernel``."""
        return self.kernel_log_prob(self.discrepancy(y), epsilon)

    def prior_grad(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Gradient of the log-prior (autodiff; reference GLMALA uses a
        1e-5 central difference, ``GLMALA.py:84-85`` — identical to machine
        precision for smooth priors)."""
        g = jax.grad(lambda t: jnp.sum(self.prior_log_prob(t)))
        return g(theta)

    # ---- reference-style aliases --------------------------------------
    def generate_samples(self, key, theta, num_samples: int = 1):
        """Alias for ``simulate`` (vmapped over ``num_samples`` if > 1)."""
        if num_samples == 1:
            return self.simulate(key, theta)
        keys = jax.random.split(key, num_samples)
        return jax.vmap(lambda k: self.simulate(k, theta))(keys)

    def calculate_log_kernel(self, y, epsilon=None):
        return self.log_kernel_of_y(y, epsilon)

    def calculate_log_kernel_dis(self, dis, epsilon=None):
        return self.kernel_log_prob(dis, epsilon)


class MixtureProblem(ABCProblem):
    """The canonical 2-D Gaussian-mixture ABC problem.

    Parity: ``examples/Mixture.py:5-53``.  theta in R^2, prior N(0, I_2),
    simulator ``y = |theta| + N(0, 0.05 I_2)`` (note: 0.05 is the *variance*;
    the reference passes ``log sqrt(0.05)`` as log-scale), discrepancy =
    Euclidean distance to ``y_obs = [1.5, 1.5]``.  The posterior is bimodal
    (+/- theta symmetry).
    """

    def __init__(self, epsilon: float = 0.05):
        self.epsilon = float(epsilon)
        self.theta_dim = 2
        self.y_obs = jnp.array([1.5, 1.5], dtype=jnp.float32)
        self._noise_std = float(jnp.sqrt(0.05))

    def simulate(self, key, theta):
        theta = jnp.asarray(theta, jnp.float32)
        noise = jax.random.normal(key, theta.shape, dtype=jnp.float32)
        return jnp.abs(theta) + self._noise_std * noise

    def prior_log_prob(self, theta):
        theta = jnp.asarray(theta, jnp.float32)
        return -0.5 * self.theta_dim * _LOG_2PI - 0.5 * jnp.sum(
            jnp.square(theta), axis=-1
        )

    def discrepancy(self, y):
        y = jnp.asarray(y, jnp.float32)
        return jnp.sqrt(jnp.sum(jnp.square(y - self.y_obs), axis=-1))


class GKProblem(ABCProblem):
    """The g-and-k distribution: a standard likelihood-free benchmark.

    The g-and-k family is defined by its quantile function
    ``Q(z; A, B, g, k) = A + B (1 + 0.8 tanh(g z / 2)) (1 + z^2)^k z`` —
    easy to simulate (transform standard normals), intractable to evaluate.
    theta = (A, B, g, k); each dataset is ``num_draws`` draws summarized by
    the seven octiles (order statistics at i/8 quantiles), a common summary
    choice; discrepancy is the Euclidean distance between octile vectors.

    Demonstrates the problem DSL beyond the Mixture family: box-uniform
    prior (out-of-support proposals hit ``-inf``/``support_retries``), a
    simulator with internal sampling + sort, and summary statistics.
    """

    def __init__(self, epsilon: float = 2.0, num_draws: int = 1000,
                 theta_true=(3.0, 1.0, 2.0, 0.5), prior_low=0.0,
                 prior_high=10.0, y_obs=None, key=None):
        self.epsilon = float(epsilon)
        self.theta_dim = 4
        self.num_draws = int(num_draws)
        self.prior_low = float(prior_low)
        self.prior_high = float(prior_high)
        if y_obs is None:
            if key is None:
                key = jax.random.PRNGKey(1234)
            y_obs = self.simulate(key, jnp.asarray(theta_true, jnp.float32))
        self.y_obs = jnp.asarray(y_obs, jnp.float32)

    @staticmethod
    def _quantile_fn(z, theta):
        A, B, g, k = (theta[..., 0], theta[..., 1], theta[..., 2],
                      theta[..., 3])
        zz = jnp.moveaxis(z, -1, 0)  # (num_draws, ...)
        q = (A + B * (1.0 + 0.8 * jnp.tanh(g * zz / 2.0))
             * (1.0 + zz * zz) ** k * zz)
        return jnp.moveaxis(q, 0, -1)  # (..., num_draws)

    def simulate(self, key, theta):
        theta = jnp.asarray(theta, jnp.float32)
        batch = theta.shape[:-1]
        z = jax.random.normal(key, batch + (self.num_draws,), jnp.float32)
        draws = self._quantile_fn(z, theta)
        draws = jnp.sort(draws, axis=-1)
        # octiles: order statistics at i/8, i = 1..7
        idx = (jnp.arange(1, 8) * self.num_draws) // 8
        return draws[..., idx]

    def prior_log_prob(self, theta):
        theta = jnp.asarray(theta, jnp.float32)
        inside = jnp.all(
            (theta >= self.prior_low) & (theta <= self.prior_high), axis=-1
        )
        logp = -self.theta_dim * jnp.log(self.prior_high - self.prior_low)
        return jnp.where(inside, logp, -jnp.inf)

    def discrepancy(self, y):
        y = jnp.asarray(y, jnp.float32)
        return jnp.sqrt(jnp.sum(jnp.square(y - self.y_obs), axis=-1))


class MA2Problem(ABCProblem):
    """MA(2) moving-average time-series ABC — a classic likelihood-free
    benchmark (Marin et al. 2012 style).

    ``y_t = e_t + theta_1 e_{t-1} + theta_2 e_{t-2}`` with iid standard
    normal innovations; each dataset of ``num_draws`` observations is
    summarized by the lag-0/1/2 empirical autocovariances
    ``s_k = (1/T) sum_t y_t y_{t-k}`` (``y_{t<0} = 0``); discrepancy is
    the Euclidean distance between summary vectors.  Prior: uniform over
    the invertibility triangle with vertices ``(-2,1), (2,1), (0,-1)``.

    Unlike the Mixture family this simulator has internal structure (a
    length-``num_draws`` recursion), making it the demonstration problem
    for the generic fused Pallas path
    (:func:`glabc_tpu.ops.pallas.generic_kernel.ma2_tile_program`), whose
    streaming in-kernel simulator computes the same summaries without
    materializing the series.
    """

    def __init__(self, epsilon: float = 0.2, num_draws: int = 100,
                 theta_true=(0.6, 0.2), y_obs=None, key=None):
        self.epsilon = float(epsilon)
        self.theta_dim = 2
        self.num_draws = int(num_draws)
        self.theta_true = jnp.asarray(theta_true, jnp.float32)
        if y_obs is None:
            if key is None:
                key = jax.random.PRNGKey(42)
            y_obs = self.simulate(key, self.theta_true)
        self.y_obs = jnp.asarray(y_obs, jnp.float32)

    def simulate(self, key, theta):
        theta = jnp.asarray(theta, jnp.float32)
        batch = theta.shape[:-1]
        T = self.num_draws
        th1, th2 = theta[..., 0:1], theta[..., 1:2]
        z = jax.random.normal(key, batch + (T + 2,), jnp.float32)
        y = z[..., 2:] + th1 * z[..., 1:-1] + th2 * z[..., :-2]  # (..., T)
        s0 = jnp.sum(y * y, axis=-1) / T
        s1 = jnp.sum(y[..., 1:] * y[..., :-1], axis=-1) / T
        s2 = jnp.sum(y[..., 2:] * y[..., :-2], axis=-1) / T
        return jnp.stack([s0, s1, s2], axis=-1)

    def prior_log_prob(self, theta):
        theta = jnp.asarray(theta, jnp.float32)
        th1, th2 = theta[..., 0], theta[..., 1]
        inside = (th2 < 1.0) & (th2 > th1 - 1.0) & (th2 > -th1 - 1.0)
        return jnp.where(inside, -jnp.log(4.0), -jnp.inf)  # triangle area 4

    def discrepancy(self, y):
        y = jnp.asarray(y, jnp.float32)
        return jnp.sqrt(jnp.sum(jnp.square(y - self.y_obs), axis=-1))

    def tile_program(self, *, lp_scale: float = 0.1):
        """The problem as a :class:`TileProgram` for the generic fused
        Pallas kernel."""
        from ..ops.pallas.generic_kernel import ma2_tile_program
        return ma2_tile_program(self, lp_scale=lp_scale)


class HighDimMixtureProblem(ABCProblem):
    """d-dimensional generalization of :class:`MixtureProblem` for stressing
    the adaptive samplers and collectives at 10^4+ chains (driver
    ``BASELINE.json`` config 5): theta in R^d, prior N(0, I_d), simulator
    ``y = |theta| + sigma N(0, I_d)``, Euclidean discrepancy to ``y_obs``."""

    def __init__(self, dim: int = 8, epsilon: float = 0.5,
                 y_obs_value: float = 1.5, noise_var: float = 0.05):
        self.epsilon = float(epsilon)
        self.theta_dim = int(dim)
        self.y_obs = jnp.full((dim,), float(y_obs_value), dtype=jnp.float32)
        self._noise_std = float(jnp.sqrt(noise_var))

    def simulate(self, key, theta):
        theta = jnp.asarray(theta, jnp.float32)
        noise = jax.random.normal(key, theta.shape, dtype=jnp.float32)
        return jnp.abs(theta) + self._noise_std * noise

    def prior_log_prob(self, theta):
        theta = jnp.asarray(theta, jnp.float32)
        return -0.5 * self.theta_dim * _LOG_2PI - 0.5 * jnp.sum(
            jnp.square(theta), axis=-1
        )

    def discrepancy(self, y):
        y = jnp.asarray(y, jnp.float32)
        return jnp.sqrt(jnp.sum(jnp.square(y - self.y_obs), axis=-1))
