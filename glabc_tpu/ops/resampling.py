"""Fixed-shape, vectorized resampling primitives.

These replace the reference's Python-loop resamplers with XLA-friendly,
branch-free formulations:

* ``weight_sampling`` (reference ``GLMCMC.py:7-22``) — an O(B) Python
  inverse-CDF loop that can return ``None`` on floating-point shortfall —
  becomes :func:`categorical_from_log_weights` (Gumbel-max), which needs no
  normalization, handles ``-inf``/NaN weights as zero mass, and vectorizes
  over chains.
* ``resample`` (reference ``GLMCMC_NFs.py:29-40`` / ``AGLMCMC.py:30-41``) —
  a Python-loop systematic resampler — becomes :func:`systematic_resample`
  via ``searchsorted(cumsum(w), (u + arange(N)) / N)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "sanitize_log_weights",
    "categorical_from_log_weights",
    "categorical_from_weights",
    "systematic_resample",
    "stable_partition_indices",
    "stable_partition_take",
    "blocked_searchsorted_take",
    "blocked_stable_partition_take",
]


def sanitize_log_weights(log_w: jnp.ndarray) -> jnp.ndarray:
    """Map NaN log-weights to ``-inf`` (zero mass).

    Mirrors the reference's ``weight[isnan(weight)] = 0`` hygiene
    (``GLMCMC.py:80-81``) in log space.
    """
    return jnp.where(jnp.isnan(log_w), -jnp.inf, log_w)


def categorical_from_log_weights(key, log_w: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Draw one index proportional to ``exp(log_w)`` via the Gumbel-max trick.

    Unnormalized log-weights are fine; NaNs count as zero mass.  If every
    weight is zero the draw degenerates to index 0 — which in the iSIR
    samplers is the "keep current state" slot, matching the reference's
    ``ind is None -> stay`` convention (``GLMCMC.py:84``).
    """
    log_w = sanitize_log_weights(log_w)
    g = jax.random.gumbel(key, log_w.shape, dtype=jnp.float32)
    score = jnp.where(jnp.isneginf(log_w), -jnp.inf, log_w + g)
    return jnp.argmax(score, axis=axis)


def categorical_from_weights(key, w: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Like :func:`categorical_from_log_weights` but on linear weights."""
    w = jnp.where(jnp.isnan(w) | (w < 0), 0.0, w)
    log_w = jnp.where(w > 0, jnp.log(jnp.where(w > 0, w, 1.0)), -jnp.inf)
    return categorical_from_log_weights(key, log_w, axis=axis)


def systematic_resample(key, w: jnp.ndarray, num_samples: int) -> jnp.ndarray:
    """Systematic (stratified, common-uniform) resampling.

    Returns ``num_samples`` indices into ``w`` such that index ``j`` appears
    ``#{i : cumsum(w)[j-1] <= u_i < cumsum(w)[j]}`` times with
    ``u_i = (u + i) / N``, ``u ~ U[0,1)`` — identical counts to the reference
    resampler (``GLMCMC_NFs.py:29-40``), computed as one ``searchsorted``.

    ``w`` must be (approximately) normalized; NaNs are treated as 0.
    """
    w = jnp.where(jnp.isnan(w) | (w < 0), 0.0, w)
    c = jnp.cumsum(w, axis=-1)
    u0 = jax.random.uniform(key, (), dtype=w.dtype)
    u = (u0 + jnp.arange(num_samples, dtype=w.dtype)) / num_samples
    idx = jnp.searchsorted(c, u, side="right")
    return jnp.clip(idx, 0, w.shape[-1] - 1)


def blocked_searchsorted_take(sorted_vals: jnp.ndarray,
                              queries: jnp.ndarray,
                              values: jnp.ndarray,
                              block: int = 32):
    """``idx = clip(searchsorted(sorted_vals, queries, 'right'), 0, n-1)``
    and ``values[idx]``, via a two-level block search — no ``(N, n)``
    compare matrix, no ``(N, n)`` one-hot, no gather.

    The flat formulations are the dominant cost of the AGLMCMC adaptation
    epoch on TPU: ``searchsorted(method='compare_all')`` plus the one-hot
    row select each stream an ``oversample*P x P`` matrix per chain
    (~700 ms of the 1.29 s epoch at 32k chains, ``r5_epoch_ablate.py``).
    Blocking ``sorted_vals`` into ``n/block`` blocks makes it two small
    compares (``(N, n/block)`` and ``(N, block)``) plus one MXU matmul that
    gathers each query's block row (cdf values AND payload columns in one
    ``(N, n/block) @ (n/block, block*(1+d))`` dot) — ~20x fewer element ops
    and ~8x less HBM traffic at the canonical pool shape.

    Exactness: ``#{v_i <= q}`` telescopes over blocks — a block is fully
    counted iff its last entry ``<= q`` (``sorted_vals`` nondecreasing), and
    only the first non-full block contributes a partial count.  Padding
    (``n`` -> multiple of ``block``) repeats the last entry, and both levels
    clip like the flat form, so the result is bitwise-identical to
    ``values[clip(searchsorted(...), 0, n-1)]`` for every finite query
    (ties included).

    Args: ``sorted_vals (n,)`` nondecreasing; ``queries (N,)``;
    ``values (n, d)`` payload rows.  Returns ``(picked (N, d), idx (N,))``.
    """
    sorted_vals = jnp.asarray(sorted_vals)
    queries = jnp.asarray(queries)
    values = jnp.asarray(values, jnp.float32)
    n = sorted_vals.shape[0]
    d = values.shape[-1]
    bs = int(block)
    nb = -(-n // bs)
    pad = nb * bs - n
    sp = jnp.concatenate(
        [sorted_vals, jnp.broadcast_to(sorted_vals[-1:], (pad,))])
    vp = jnp.concatenate(
        [values, jnp.broadcast_to(values[-1:], (pad, d))])
    sB = sp.reshape(nb, bs)
    ends = sB[:, -1]                                          # (nb,)
    blk = jnp.sum((ends[None, :] <= queries[:, None]).astype(jnp.int32),
                  axis=1)
    blk = jnp.clip(blk, 0, nb - 1)
    ohB = (blk[:, None] == jnp.arange(nb, dtype=jnp.int32)[None, :]
           ).astype(jnp.float32)                              # (N, nb)
    # one dot gathers the block's cdf row AND its payload columns.  The
    # payload is FEATURE-MAJOR ([cdf | v_0 | v_1 | ...], each (nb, bs)) and
    # every downstream op stays 2-D: a (N, bs, d) temp with d minor-most
    # hits XLA's T(8,128) lane padding (d=2 -> 128, a 64x HBM blowup that
    # measurably inverts the win; see CLAUDE.md / r5_epoch_ablate.py).
    payload = jnp.concatenate(
        [sB] + [vp[:, f].reshape(nb, bs) for f in range(d)], axis=1)
    rows = jnp.dot(ohB, payload,
                   preferred_element_type=jnp.float32)        # (N, bs*(1+d))
    row_s = rows[:, :bs]
    idx_in = jnp.sum((row_s <= queries[:, None]).astype(jnp.int32), axis=1)
    idx_in = jnp.clip(idx_in, 0, bs - 1)
    ohin = (idx_in[:, None] == jnp.arange(bs, dtype=jnp.int32)[None, :]
            ).astype(jnp.float32)                             # (N, bs)
    picked = jnp.stack(
        [jnp.sum(ohin * rows[:, bs * (1 + f): bs * (2 + f)], axis=1)
         for f in range(d)], axis=-1)                         # (N, d)
    idx = jnp.clip(blk * bs + idx_in, 0, n - 1)
    return picked, idx


def blocked_stable_partition_take(x: jnp.ndarray, ok: jnp.ndarray,
                                  n_take: int,
                                  block: int = 128) -> jnp.ndarray:
    """:func:`stable_partition_take` semantics (valid rows first, stable;
    invalid rows fill the remainder, stable) without the ``(n_take, n)``
    one-hot — the destination map inverts into two monotone searchsorteds
    (``j_p = #{j : cumsum(ok)_j <= p}`` for valid slots, the ``~ok``
    cumulative for the remainder), each served by
    :func:`blocked_searchsorted_take`.  Bitwise-identical output."""
    ok = ok.astype(bool)
    n = ok.shape[0]
    okf = ok.astype(jnp.float32)
    cum_ok = jnp.cumsum(okf)
    n_ok = cum_ok[-1]
    cum_bad = jnp.arange(1, n + 1, dtype=jnp.float32) - cum_ok
    p = jnp.arange(n_take, dtype=jnp.float32)
    # counts are integers in float32 (exact below 2^24); query p selects the
    # first j with cum == p+1, i.e. searchsorted-right at p (+0.0)
    val_pick, _ = blocked_searchsorted_take(cum_ok, p, x, block)
    bad_pick, _ = blocked_searchsorted_take(cum_bad, p - n_ok, x, block)
    return jnp.where((p < n_ok)[:, None], val_pick, bad_pick)


def stable_partition_indices(ok: jnp.ndarray) -> jnp.ndarray:
    """Indices listing True rows first (stable) — ``argsort(~ok, stable)``
    without the sort.

    The reference's "keep the first N prior-supported KDE draws" gather
    (``AGLMCMC.py:220-229``) needs a stable valid-rows-first permutation.
    ``jnp.argsort`` lowers to an O(n log^2 n) bitonic sorter on TPU and was
    the dominant cost of the adaptation epoch at 4x-oversampled pools; the
    permutation is computable in linear time from two cumulative sums and
    one unique-index scatter.
    """
    ok = ok.astype(bool)
    n = ok.shape[-1] if ok.ndim else ok.shape[0]
    n_ok = jnp.sum(ok)
    rank_ok = jnp.cumsum(ok) - 1
    rank_bad = jnp.cumsum(~ok) - 1
    pos = jnp.where(ok, rank_ok, n_ok + rank_bad)  # destination of row i
    return (jnp.zeros((n,), jnp.int32)
            .at[pos].set(jnp.arange(n, dtype=jnp.int32), unique_indices=True))


def stable_partition_take(x: jnp.ndarray, ok: jnp.ndarray,
                          n_take: int) -> jnp.ndarray:
    """``x[stable_partition_indices(ok)[:n_take]]`` without the scatter or
    the gather: the first ``n_take`` rows of the stable valid-first
    permutation, selected by a one-hot ``(n_take, n) @ (n, d)`` matmul.

    Bitwise-identical to the scatter+gather form (each one-hot row holds a
    single exact 1.0), but the row movement runs on the MXU — scatters and
    gathers serialize badly when this is vmapped over 10^4 chains in the
    AGLMCMC adaptation epoch's oversampled-candidate filter
    (``AGLMCMC.py:220-229``).
    """
    ok = ok.astype(bool)
    n = ok.shape[0]
    n_ok = jnp.sum(ok)
    rank_ok = jnp.cumsum(ok) - 1
    rank_bad = jnp.cumsum(~ok) - 1
    dest = jnp.where(ok, rank_ok, n_ok + rank_bad)       # (n,) destinations
    onehot = (jnp.arange(n_take, dtype=dest.dtype)[:, None]
              == dest[None, :]).astype(jnp.float32)      # (n_take, n)
    return jnp.dot(onehot, jnp.asarray(x, jnp.float32),
                   preferred_element_type=jnp.float32)
