"""Chain diagnostics and weighted statistics.

Parity targets:

* :func:`esjd` — reference ``ESJD.py:2-25`` (generalized-variance ESJD).
* :func:`weighted_std` — reference ``kernel_density.py:39-68`` (weighted
  unbiased standard deviation with the ``1 - sum(w^2)`` correction).
* :func:`chain_summary` — the per-dimension mean / variance / 95% CI report
  every reference sampler prints (e.g. ``GLMCMC.py:113-135``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

__all__ = ["esjd", "esjd_per_second", "ess", "rhat", "weighted_std",
           "chain_summary", "ChainSummary"]


def esjd(chain: jnp.ndarray) -> jnp.ndarray:
    """Expected squared jump distance as a generalized variance.

    ``det(delta^T delta / (N-1)) ** (1/d)`` over consecutive jumps
    ``delta = chain[1:] - chain[:-1]`` — the reference formula
    (``ESJD.py:17-24``).  Accepts ``(N, d)`` or batched ``(..., N, d)``;
    batched input returns one ESJD per leading index.
    """
    chain = jnp.asarray(chain)
    delta = chain[..., 1:, :] - chain[..., :-1, :]
    n = delta.shape[-2]
    d = delta.shape[-1]
    m = jnp.einsum("...nd,...ne->...de", delta, delta) / n
    det = jnp.linalg.det(m)
    return jnp.sign(det) * jnp.abs(det) ** (1.0 / d)


def esjd_per_second(chain: jnp.ndarray, wallclock_s: float, num_ite: int) -> jnp.ndarray:
    """The reference's hyperparameter-selection score:
    ``esjd(chain) / (wallclock / num_ite)`` (``Mixture_hyper.py:36-37``)."""
    return esjd(chain) / (wallclock_s / num_ite)


def ess(chain: jnp.ndarray) -> jnp.ndarray:
    """Effective sample size per dimension (Geyer initial-positive-sequence).

    The reference computes ESS nowhere but prints a commented-out ESS line
    in every summary (``GLMCMC.py:136``); this supplies the capability.
    FFT autocovariance + paired-lag truncation at the first non-positive
    pair sum; vectorized over ``(..., N, d)`` -> ``(..., d)``.
    """
    chain = jnp.asarray(chain, jnp.float32)
    n = chain.shape[-2]
    x = chain - jnp.mean(chain, axis=-2, keepdims=True)
    f = jnp.fft.rfft(x, n=2 * n, axis=-2)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=2 * n, axis=-2)[..., :n, :] / n
    rho = acov / jnp.where(acov[..., :1, :] == 0, 1.0, acov[..., :1, :])
    # paired sums Gamma_m = rho_{2m} + rho_{2m+1}
    n_pairs = n // 2
    pairs = rho[..., : 2 * n_pairs, :].reshape(
        rho.shape[:-2] + (n_pairs, 2, rho.shape[-1])
    ).sum(axis=-2)                                     # (..., n_pairs, d)
    keep = jnp.cumprod(pairs > 0.0, axis=-2)
    tau = -1.0 + 2.0 * jnp.sum(pairs * keep, axis=-2)  # (..., d)
    tau = jnp.maximum(tau, 1.0)
    return n / tau


def rhat(chains) -> jnp.ndarray:
    """Rank-normalized split-:math:`\\hat R` per dimension (Vehtari, Gelman,
    Simpson, Carpenter & Bürkner 2021).

    The multi-chain convergence diagnostic this framework's 10^3-10^6
    parallel chains make natural; the reference (single chain) has no
    counterpart — this extends its ``ESJD.py:2-25``-class diagnostics to the
    multi-chain regime.  ``chains``: ``(C, N, d)`` with ``C >= 2``.  Returns
    ``(d,)`` — the max of the bulk (rank-normalized) and tail (folded)
    statistics; values near 1 (< 1.01) indicate mixing.

    Host-side numpy/scipy like :func:`chain_summary` (end-of-run reporting,
    not a jit-path op); ties get average ranks — important because rejected
    MH proposals repeat values exactly.
    """
    import numpy as _np
    from scipy.stats import norm as _norm
    from scipy.stats import rankdata as _rankdata

    x = _np.asarray(chains, _np.float64)
    assert x.ndim == 3 and x.shape[0] >= 2, "rhat needs (C>=2, N, d) chains"
    C, N, d = x.shape
    half = N // 2
    assert half >= 2, "rhat needs at least 4 draws per chain"
    split = x[:, : 2 * half, :].reshape(C * 2, half, d)
    m, n = C * 2, half

    def _split_rhat(z):
        cm = z.mean(axis=1)                       # (m, d)
        B = n * cm.var(axis=0, ddof=1)            # between-chain
        W = z.var(axis=1, ddof=1).mean(axis=0)    # within-chain
        W = _np.where(W == 0.0, _np.finfo(_np.float64).tiny, W)
        return _np.sqrt(((n - 1) / n * W + B / n) / W)

    def _rank_normal(v):                          # (m, n, d) -> z-scores
        flat = v.reshape(m * n, d)
        r = _np.stack([_rankdata(flat[:, j], method="average")
                       for j in range(d)], axis=1)
        z = _norm.ppf((r - 0.375) / (m * n + 0.25))
        return z.reshape(m, n, d)

    bulk = _split_rhat(_rank_normal(split))
    folded = _split_rhat(_rank_normal(
        _np.abs(split - _np.median(split.reshape(m * n, d), axis=0))
    ))
    return jnp.asarray(_np.maximum(bulk, folded), jnp.float32)


def weighted_std(x: jnp.ndarray, weights: jnp.ndarray, unbiased: bool = True,
                 axis: int = 0) -> jnp.ndarray:
    """Weighted standard deviation with reliability-weight bias correction.

    Matches reference ``kernel_density.weighted_std`` (``:39-68``):
    normalize weights, weighted mean/variance, and for ``unbiased`` divide by
    ``clamp(1 - sum(w^2), min=1e-10)``.
    """
    w = weights / jnp.sum(weights)
    w_ex = jnp.expand_dims(w, axis=-1) if x.ndim > w.ndim else w
    mean = jnp.sum(w_ex * x, axis=axis)
    diff = x - mean
    var = jnp.sum(w_ex * jnp.square(diff), axis=axis)
    if unbiased:
        correction = jnp.clip(1.0 - jnp.sum(jnp.square(w)), min=1e-10)
        var = var / correction
    return jnp.sqrt(var)


@dataclasses.dataclass(frozen=True)
class ChainSummary:
    mean: jnp.ndarray       # (d,)
    variance: jnp.ndarray   # (d,)
    ci_lower: jnp.ndarray   # (d,)
    ci_upper: jnp.ndarray   # (d,)
    esjd: Optional[jnp.ndarray] = None
    acceptance_rate: Optional[float] = None
    ess: Optional[jnp.ndarray] = None   # (d,) mean ESS per dimension
    rhat: Optional[jnp.ndarray] = None  # (d,) rank-normalized split-R-hat

    def render(self) -> str:
        lines = []
        for i in range(self.mean.shape[0]):
            lines.append(f"Theta_Re {i + 1}:")
            lines.append(f"  Mean: {float(self.mean[i]):.4f}")
            lines.append(f"  Variance: {float(self.variance[i]):.4f}")
            lines.append(
                "  95% Confidence Interval: "
                f"({float(self.ci_lower[i]):.4f}, {float(self.ci_upper[i]):.4f})"
            )
            if self.ess is not None:
                lines.append(
                    f"  Effective Sample Size: {float(self.ess[i]):.2f}"
                )
            if self.rhat is not None:
                lines.append(f"  R-hat: {float(self.rhat[i]):.4f}")
        if self.esjd is not None:
            lines.append(f"ESJD: {float(self.esjd):.6g}")
        if self.acceptance_rate is not None:
            lines.append(f"Acceptance rate: {float(self.acceptance_rate):.4f}")
        return "\n".join(lines)


def chain_summary(chain: jnp.ndarray, acceptance_rate=None,
                  with_esjd: bool = False,
                  with_ess: bool = False,
                  with_rhat: bool = False) -> ChainSummary:
    """Per-dimension mean / variance / z=1.96 95% CI, pooled over all leading
    axes (chains x time).  Variance uses the unbiased estimator to match
    ``torch.var`` in the reference report (``GLMCMC.py:113-127``).
    ``with_ess`` adds the per-dimension ESS line the reference leaves
    commented out (``GLMCMC.py:136``), summed over chains.  ``with_rhat``
    adds rank-normalized split-:math:`\\hat R` (needs ``(C>=2, N, d)``
    chains; silently omitted otherwise)."""
    # accumulate on host in float64: naive float32 reductions over >1e7
    # samples visibly bias the mean (observed ~0.1 absolute error at 16M)
    import numpy as _np
    d = chain.shape[-1]
    flat = _np.asarray(chain, dtype=_np.float64).reshape(-1, d)
    mean = jnp.asarray(_np.mean(flat, axis=0), jnp.float32)
    var = jnp.asarray(_np.var(flat, axis=0, ddof=1), jnp.float32)
    std = jnp.sqrt(var)
    z = 1.96
    ej = esjd(flat) if with_esjd else None
    e = None
    if with_ess:
        arr = jnp.asarray(chain)
        if arr.ndim == 2:
            arr = arr[None]
        e = jnp.sum(ess(arr), axis=0)  # total ESS across chains, per dim
    r = None
    if with_rhat:
        arr = _np.asarray(chain)
        if arr.ndim == 3 and arr.shape[0] >= 2 and arr.shape[1] >= 4:
            r = rhat(arr)
    return ChainSummary(
        mean=mean,
        variance=var,
        ci_lower=mean - z * std,
        ci_upper=mean + z * std,
        esjd=ej,
        acceptance_rate=acceptance_rate,
        ess=e,
        rhat=r,
    )
