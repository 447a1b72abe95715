"""Weighted Gaussian-product kernel density estimator.

Capability parity with the reference ``glabcmcmc/kernel_density.py`` (fit
:70, log_prob :96, sample :130, forward :158), re-designed as an immutable
JAX pytree so a fitted KDE can live inside a ``lax.scan`` carry, be vmapped
over chains (one KDE per chain), and be sharded across a mesh.

Differences from the reference, by design:

* ``fit`` is a pure function returning a new :class:`KernelDensity` pytree —
  no mutable ``_fitted`` state.
* All shapes are static: masked rows (weight 0) are supported so AGLMCMC's
  "keep positive-weight samples" filter (``AGLMCMC.py:207-208``) becomes a
  weight mask instead of a dynamic gather; the bandwidth formula counts only
  unmasked rows (the reference fits on the filtered subset, so ``n`` there is
  the positive-weight count).
* ``log_prob`` keeps the reference's ``log(w + 1e-10)`` stabilizer
  (``kernel_density.py:125``) for numerical parity.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp

from ..ops.stats import weighted_std

__all__ = ["KernelDensity"]

_LOG_2PI = jnp.log(2.0 * jnp.pi)


@dataclasses.dataclass(frozen=True)
class KernelDensity:
    """A fitted weighted Gaussian KDE (immutable pytree)."""

    X: jnp.ndarray          # (n, d) support points
    weights: jnp.ndarray    # (n,) normalized (masked rows have weight 0)
    bandwidth: jnp.ndarray  # (d,) per-feature bandwidth

    @property
    def dim(self) -> int:
        return self.X.shape[-1]

    @property
    def n_samples(self) -> int:
        return self.X.shape[-2]

    # ------------------------------------------------------------------ fit
    @staticmethod
    def fit(X: jnp.ndarray, weights: jnp.ndarray | None = None,
            bandwidth: Union[str, float, jnp.ndarray] = "silverman") -> "KernelDensity":
        """Fit the estimator (pure function).

        ``bandwidth``: 'silverman' — ``(n (d+2) / 4)^(-1/(d+4))``; 'scott' —
        ``n^(-1/(d+4))``; or an explicit scalar / per-feature vector.  The
        rule-of-thumb factor multiplies the *weighted* unbiased std
        (``kernel_density.py:22-37``).  ``n`` counts rows with positive
        weight, so masked (zero-weight) rows do not distort the bandwidth.
        """
        X = jnp.asarray(X, jnp.float32)
        n, d = X.shape
        if weights is None:
            w = jnp.full((n,), 1.0 / n, dtype=jnp.float32)
        else:
            w = jnp.asarray(weights, jnp.float32)
            w = jnp.where(jnp.isnan(w) | (w < 0), 0.0, w)
            w = w / jnp.sum(w)

        if isinstance(bandwidth, str):
            n_eff = jnp.sum(w > 0).astype(jnp.float32)
            if bandwidth == "silverman":
                h = (n_eff * (d + 2) / 4.0) ** (-1.0 / (d + 4))
            elif bandwidth == "scott":
                h = n_eff ** (-1.0 / (d + 4))
            else:
                raise ValueError(
                    "bandwidth should be 'silverman', 'scott' or a float"
                )
            bw = h * weighted_std(X, w, unbiased=True, axis=0)
        else:
            bw = jnp.broadcast_to(jnp.asarray(bandwidth, jnp.float32), (d,))
        return KernelDensity(X=X, weights=w, bandwidth=bw)

    # ------------------------------------------------------------- log_prob
    def log_prob(self, x: jnp.ndarray,
                 support_chunk: int = 0) -> jnp.ndarray:
        """Log-density at ``x`` of shape ``(..., d)`` -> ``(...,)``.

        The reference materializes the ``(points, support, d)`` broadcast
        (``kernel_density.py:117-120``); here the squared Mahalanobis
        distance is decomposed as ``|x'|^2 - 2 x'.X' + |X'|^2`` (with
        ``x' = x / h``) so the cross term is a ``(points, d) @ (d, support)``
        matmul — it runs on the MXU and the peak intermediate is the
        ``(points, support)`` distance matrix, not ``(points, support, d)``.

        ``support_chunk > 0`` streams that matrix over support chunks with a
        running (max, scaled-sum) logsumexp — peak ``(points, chunk)`` —
        the same formulation as the resident-mixture kernel's in-VMEM
        density (``pool_isir_mixed_kernel.py``).  Vmapped over 10^3-10^5
        chains in the AGLMCMC adaptation epochs the full matrix is
        gigabytes; streaming is what lifts the epoch HBM ceiling.  Result
        differs from the unchunked path only by reduction order (~1 ulp).
        """
        x = jnp.asarray(x, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        lead = x.shape[:-1]
        xs = (x / self.bandwidth).reshape(-1, self.dim)          # (p, d)
        Xs = self.X / self.bandwidth                             # (n, d)
        log_const = (-0.5 * self.dim * _LOG_2PI
                     - jnp.sum(jnp.log(self.bandwidth)))
        xs_sq = jnp.sum(jnp.square(xs), axis=-1)                 # (p,)

        def weighted_kernel(Xs_c, w_c):
            """log(K(x, X_c) * (w_c + 1e-10)) block, shape (p, nc)."""
            cross = jnp.dot(xs, Xs_c.T, preferred_element_type=jnp.float32)
            sq = (xs_sq[:, None] - 2.0 * cross
                  + jnp.sum(jnp.square(Xs_c), axis=-1)[None, :])
            sq = jnp.maximum(sq, 0.0)  # guard cancellation at tiny distances
            return -0.5 * sq + log_const + jnp.log(w_c + 1e-10)

        n = self.n_samples
        if not (support_chunk and support_chunk < n):
            out = jax.scipy.special.logsumexp(
                weighted_kernel(Xs, self.weights), axis=-1)
        else:
            cn = int(support_chunk)
            n_blk = -(-n // cn)
            pad = n_blk * cn - n
            Xp = jnp.pad(Xs, ((0, pad), (0, 0)))
            # pad rows are masked to -inf below (NOT weight 0: the
            # reference's +1e-10 gives even zero-weight rows mass, and the
            # unchunked path has exactly n rows)
            wp = jnp.pad(self.weights, (0, pad))
            valid = jnp.pad(jnp.ones((n,), bool), (0, pad))
            p = xs.shape[0]

            def body(carry, blk):
                m, s = carry
                Xc, wc, vc = blk
                lw = jnp.where(vc[None, :], weighted_kernel(Xc, wc),
                               -jnp.inf)                          # (p, cn)
                bm = jnp.max(lw, axis=-1)
                new_m = jnp.maximum(m, bm)
                # exp(-inf - -inf) guards: new_m == -inf only while every
                # term so far is -inf; keep s at 0 there
                scale = jnp.where(jnp.isneginf(new_m), 0.0,
                                  jnp.exp(m - new_m))
                add = jnp.sum(
                    jnp.where(jnp.isneginf(new_m)[:, None], 0.0,
                              jnp.exp(lw - new_m[:, None])), axis=-1)
                return (new_m, s * scale + add), None

            init = (jnp.full((p,), -jnp.inf), jnp.zeros((p,)))
            (m, s), _ = jax.lax.scan(
                body, init,
                (Xp.reshape(n_blk, cn, self.dim),
                 wp.reshape(n_blk, cn), valid.reshape(n_blk, cn)))
            out = m + jnp.log(s)
        out = out.reshape(lead)
        return out[0] if squeeze else out

    # --------------------------------------------------------------- sample
    def sample(self, key, num_samples: int = 1,
               matmul_select: bool = False) -> jnp.ndarray:
        """Multinomial component pick + per-feature Gaussian noise
        (``kernel_density.py:130-156``).

        The component pick is inverse-CDF sampling (cumsum + binary search)
        rather than ``jax.random.categorical``: the Gumbel-max trick
        materializes a ``(num_samples, support)`` noise matrix, which at
        AGLMCMC's epoch scale (10^4 chains x 4 x pool oversampled draws over
        a ~10^3-point support) is tens of GB per epoch; inverse-CDF is
        ``O(num_samples log support)`` with the same iid categorical law.
        Zero-weight (masked) rows have flat CDF segments and are never
        selected.

        ``matmul_select=True`` replaces the final row gather ``X[idx]`` and
        the flat compare-and-count search with the blocked two-level form
        (:func:`glabc_tpu.ops.resampling.blocked_searchsorted_take`) —
        bitwise-identical indices and rows, but ~20x fewer element ops and
        ~8x less HBM traffic than the flat ``(num_samples, support)``
        compare + one-hot matmul, which were ~700 ms of the 1.29 s AGLMCMC
        adaptation epoch at 32k chains (``benchmarks/r5_epoch_ablate.py``).
        Gathers are not an option either way: vmapped over 10^4 chains they
        serialize (the searchsorted-binary-search form was ~470 ms per 1024
        chains)."""
        k_idx, k_noise = jax.random.split(key)
        cdf = jnp.cumsum(self.weights)
        u = jax.random.uniform(k_idx, (num_samples,)) * cdf[-1]
        noise = jax.random.normal(k_noise, (num_samples, self.dim)) * self.bandwidth
        if matmul_select:
            from ..ops.resampling import blocked_searchsorted_take
            picked, _ = blocked_searchsorted_take(cdf, u, self.X)
        else:
            # flat compare-and-count inverse CDF: idx = #{i : cdf_i <= u}
            idx = jnp.clip(
                jnp.searchsorted(cdf, u, side="right",
                                 method="compare_all"),
                0, self.n_samples - 1)
            picked = self.X[idx]
        return picked + noise

    def forward(self, key, num_samples: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        samples = self.sample(key, num_samples)
        return samples, self.log_prob(samples)


jax.tree_util.register_dataclass(
    KernelDensity, data_fields=["X", "weights", "bandwidth"], meta_fields=[]
)
