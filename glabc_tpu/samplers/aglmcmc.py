"""AGLMCMC: adaptive global proposal (weighted KDE) with epsilon-annealing.

Capability parity with reference ``glabcmcmc/AGLMCMC.py:44-289``:

* global moves are iSIR over a precomputed proposal *pool*, consuming one
  ``batch_size`` slice per move (``AGLMCMC.py:130-164``);
* every ``step_size`` consumed slices, an adaptation epoch (``:170-249``):
  (1) anneal the auxiliary threshold ``hat_eps`` from 1e6 toward
  ``hat_eps_T`` by the quantile rule
  ``q = clamp(alpha * #{dis < hat_eps} / n, 0, 1)``,
  ``hat_eps = max(quantile(dis, q), hat_eps_T)``;
  (2) recompute *training* weights with the kernel at ``hat_eps`` (the chain
  itself always targets the true epsilon — pool MCMC weights use the target
  kernel, ``AGLMCMC.py:104``);
  (3) fit a weighted Silverman KDE on the pool;
  (4) draw a 4x-oversampled new pool from the KDE, keep prior-supported
  samples (``prior_log_prob > log(1e-10)``), re-simulate and re-weight.

TPU-first redesign:

* one pool per chain, carried across fixed-length scan segments of
  ``round(step_size / gf)`` steps; the pool cursor ``kk`` advances on global
  moves and resets at each epoch.  With the canonical
  ``global_frequency = 1`` a segment consumes exactly ``step_size`` slices,
  reproducing the reference epoch boundary exactly (``AGLMCMC.py:170``).
  For ``gf < 1`` the consumed-slice count per segment is
  ``Binomial(seg_len, gf)`` while the reference adapts after exactly
  ``step_size`` consumed slices (data-dependent).  Because the adaptation
  inputs are the *pool contents* — independent of the chain state — the only
  kernel-level distortion a fixed segment could introduce is slice REUSE;
  pools therefore carry ``pool_slack`` extra slices (default ~5 sigma of the
  binomial overshoot, so reuse probability is ~1e-9 per chain-epoch; the
  astronomically-rare overflow clamps to the last slice) and every global
  move consumes a FRESH slice.  What remains vs the reference is only
  epoch-timing jitter (a pool refresh a few iterations early/late), which
  ``tests/test_aglmcmc_cadence.py`` bounds statistically against an
  exact-consumption oracle at gf=0.5;
* the reference's dynamic "keep first N valid KDE samples" gather
  (``AGLMCMC.py:220-229``) becomes a stable valid-rows-first permutation
  (linear cumsum+scatter, :func:`glabc_tpu.ops.resampling.stable_partition_indices`)
  — fixed shapes, no TPU sort;
* NaN discrepancies are masked to ``1e6 - 5`` *per element* — the
  reference's ``torch.all``-reduced mask (``AGLMCMC.py:100``) is a scalar
  no-op unless every entry is NaN (SURVEY quirk 2);
* the chain buffer is sized by ``num_ite`` and the full chain is returned —
  the reference hardcodes a 10,000-row buffer and returns ``None``
  (``AGLMCMC.py:117``, SURVEY quirk 1);
* the epoch update is the collective hook for multi-chip runs: with a
  shared adaptation the pools are all-gathered and the quantile computed
  globally (see ``glabc_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.kde import KernelDensity
from ..ops.resampling import (
    categorical_from_log_weights,
    stable_partition_take,
    systematic_resample,
)
from .base import MoveCounts, SamplerResult, StepOut, local_rw_move
from .chain import init_chain_carry

__all__ = ["AGLMCMCConfig", "run_aglmcmc", "AGLResult"]

_NAN_DIS = 1.0e6 - 5.0  # reference sentinel for NaN discrepancies (:101)
_PRIOR_CUTOFF = float(np.log(1e-10))  # reference KDE prior filter (:224)


@dataclasses.dataclass(frozen=True)
class AGLMCMCConfig:
    global_frequency: float = 1.0
    batch_size: int = 5
    step_size: int = 200
    alpha: float = 0.8
    hat_eps_T: float = 0.2
    oversample: int = 4           # reference 4x (AGLMCMC.py:220)
    support_retries: int = 0
    pool_slack: int = 0           # extra pool slices beyond step_size

    @property
    def pool_slices(self) -> int:
        return self.step_size + self.pool_slack


def default_pool_slack(step_size: int, global_frequency: float) -> int:
    """Slack slices so a fixed ``round(step_size/gf)``-step segment overshoots
    the pool with probability ~1e-9 per chain-epoch (5 sigma of the
    ``Binomial(seg_len, gf)`` consumed-slice count, plus a floor).  0 at the
    canonical gf=1, where consumption is deterministic."""
    gf = float(global_frequency)
    if gf >= 1.0 or gf <= 0.0:
        return 0
    seg_len = max(1, int(round(step_size / gf)))
    sigma = float(np.sqrt(seg_len * gf * (1.0 - gf)))
    return int(np.ceil(5.0 * sigma)) + 8


class Pool(NamedTuple):
    """Per-chain proposal pool (leading axis = pool slot)."""

    theta: jnp.ndarray       # (P, d)
    x: jnp.ndarray           # (P, d_y)
    dis: jnp.ndarray         # (P,) — NaNs already masked to the sentinel
    log_q: jnp.ndarray       # (P,) proposal log-density at draw time
    log_w: jnp.ndarray       # (P,) MCMC log-weight at the *target* epsilon


class AGLCarry(NamedTuple):
    theta: jnp.ndarray
    y: jnp.ndarray
    log_kernel: jnp.ndarray
    kk: jnp.ndarray          # pool cursor (consumed slices this epoch)
    key: jnp.ndarray
    counts: MoveCounts


def _pool_from_proposals(problem, key, theta_prop, log_q):
    """Simulate + weight a pool of proposals (``AGLMCMC.py:84-112``)."""
    nan_row = jnp.any(jnp.isnan(theta_prop), axis=-1)
    theta_safe = jnp.where(nan_row[:, None], 0.0, theta_prop)
    x = problem.simulate(key, theta_safe)
    dis = problem.discrepancy(x)
    dis = jnp.where(jnp.isnan(dis) | nan_row, _NAN_DIS, dis)
    log_k = problem.kernel_log_prob(dis)  # target epsilon (:104)
    log_w = problem.prior_log_prob(theta_prop) + log_k - log_q
    log_w = jnp.where(nan_row | jnp.isnan(log_w), -jnp.inf, log_w)
    return Pool(theta=theta_safe, x=x, dis=dis, log_q=log_q, log_w=log_w)


def _epoch_redraw(problem, cfg: AGLMCMCConfig, key, pool: Pool, hat_eps):
    """Adaptation epoch for one chain, up to (but excluding) the redrawn
    pool's proposal log-density: anneal -> training weights -> weighted-KDE
    fit -> blocked oversampled redraw + prior filter.  Returns
    ``(new_theta, kde, new_hat_eps, k_sim)``."""
    P = pool.theta.shape[0]
    k_sample, k_sim = jax.random.split(key)

    # (1) epsilon annealing (:174-196)
    def anneal(eps):
        num_a = jnp.sum(pool.dis < eps)
        q = jnp.clip(cfg.alpha * num_a / P, 0.0, 1.0)
        new_eps = jnp.quantile(pool.dis, q)
        return jnp.maximum(new_eps, cfg.hat_eps_T)

    hat_eps = jnp.where(hat_eps > cfg.hat_eps_T, anneal(hat_eps), hat_eps)

    # (2) training weights at hat_eps (:199-204)
    train_log_k = problem.kernel_log_prob(pool.dis, hat_eps)
    train_log_w = (
        problem.prior_log_prob(pool.theta) + train_log_k - pool.log_q
    )
    train_w = jnp.exp(train_log_w)
    train_w = jnp.where(jnp.isnan(train_w), 0.0, train_w)

    # (3) weighted Silverman KDE on positive-weight pool rows (:207-215);
    # zero-weight rows are masked out inside fit.
    kde = KernelDensity.fit(pool.theta, train_w, bandwidth="silverman")

    # (4) oversampled redraw + prior-support filter (:220-229).  The
    # component pick uses the blocked two-level search (bitwise-identical
    # to the flat compare/one-hot form, ~500 ms cheaper per 32k-chain
    # epoch); the partition stays on the FLAT one-hot matmul — its blocked
    # form measured ~170 ms slower inside the fused epoch
    # (benchmarks/r5_epoch_ablate.py), the 4x-smaller query count doesn't
    # amortize the two extra searchsorted passes
    cand = kde.sample(k_sample, cfg.oversample * P, matmul_select=True)
    ok = problem.prior_log_prob(cand) > _PRIOR_CUTOFF
    new_theta = stable_partition_take(cand, ok, P)
    return new_theta, kde, hat_eps, k_sim


def _epoch_update(problem, cfg: AGLMCMCConfig, key, pool: Pool, hat_eps,
                  logp_chunk: int = 0):
    """One adaptation epoch for one chain -> (new_pool, kde, new_hat_eps).

    ``logp_chunk > 0`` streams the redrawn pool's ``kde.log_prob`` over
    support chunks (see :meth:`KernelDensity.log_prob`): vmapped over the
    chain axis the full (P, P) distance matrix is ~4 GB per 1024-chain
    epoch chunk — the HBM peak of the adaptation epoch."""
    new_theta, kde, hat_eps, k_sim = _epoch_redraw(problem, cfg, key, pool,
                                                   hat_eps)
    new_log_q = kde.log_prob(new_theta, support_chunk=logp_chunk)
    new_pool = _pool_from_proposals(problem, k_sim, new_theta, new_log_q)
    return new_pool, kde, hat_eps


def _shared_epoch_update(problem, cfg: AGLMCMCConfig, shared_support: int,
                         key, pools: Pool, hat_eps, redraw_chunk: int = 0):
    """Shared (cross-chain) adaptation epoch: one epsilon quantile and one
    KDE fit over ALL chains' pools.

    ``redraw_chunk > 0`` runs the per-chain pool redraws in sequential
    ``lax.map`` chunks of that many chains: the 4x-oversampled candidate
    draw materializes a ``(chunk, 4P, d)`` temp whose flattened ``(N, d)``
    form is lane-padded d -> 128 on TPU (64x HBM at d=2), so the
    all-chains-at-once draw OOMs past ~10k chains.

    The pooled training set (C*P weighted samples) is compressed to
    ``shared_support`` points by weighted systematic resampling — which
    preserves the target distribution — so the shared KDE's support stays
    matmul-sized regardless of chain count.  New per-chain pools are then
    drawn from the shared KDE.  Returns ``(new_pools, kde, new_hat_eps)``
    with ``kde`` UNBATCHED (shared by every chain).
    """
    C, P, d = pools.theta.shape
    k_res, k_sample, k_sim = jax.random.split(key, 3)

    dis_all = pools.dis.reshape(-1)
    n_all = dis_all.shape[0]

    def anneal(eps):
        num_a = jnp.sum(dis_all < eps)
        q = jnp.clip(cfg.alpha * num_a / n_all, 0.0, 1.0)
        return jnp.maximum(jnp.quantile(dis_all, q), cfg.hat_eps_T)

    hat_eps = jnp.where(hat_eps > cfg.hat_eps_T, anneal(hat_eps), hat_eps)

    # keep (C, P, d) shapes end-to-end: reshaping the pooled thetas to
    # (C*P, d) forces a relayout whose lane dim pads d -> 128 on TPU (a
    # 64x HBM blowup — 67 GB at 65k chains); only the 1-D weights are
    # flattened and the resampled support rows are gathered directly.
    train_log_k = problem.kernel_log_prob(pools.dis, hat_eps)       # (C, P)
    train_log_w = (
        problem.prior_log_prob(pools.theta) + train_log_k - pools.log_q
    )
    w = jnp.exp(train_log_w)
    w = jnp.where(jnp.isnan(w), 0.0, w)
    w = w / jnp.sum(w)
    idx = systematic_resample(k_res, w.reshape(-1), shared_support)
    support = pools.theta[idx // P, idx % P]                # (S, d)
    kde = KernelDensity.fit(support, None, bandwidth="silverman")

    def redraw(kk):
        k_s, k_x = jax.random.split(kk)
        cand = kde.sample(k_s, cfg.oversample * P, matmul_select=True)
        ok = problem.prior_log_prob(cand) > _PRIOR_CUTOFF
        new_theta = stable_partition_take(cand, ok, P)
        new_log_q = kde.log_prob(new_theta)
        return _pool_from_proposals(problem, k_x, new_theta, new_log_q)

    keys = jax.random.split(k_sample, C)
    vredraw = jax.vmap(redraw)
    if redraw_chunk and redraw_chunk < C:
        if C % redraw_chunk:
            raise ValueError(
                f"num_chains={C} must be divisible by "
                f"redraw_chunk={redraw_chunk} (pass a divisor, or 0 for "
                "unchunked redraws)")
        n_blk = C // redraw_chunk
        new_pools = jax.lax.map(
            vredraw, keys.reshape(n_blk, redraw_chunk, *keys.shape[1:]))
        new_pools = jax.tree_util.tree_map(
            lambda x: x.reshape((C,) + x.shape[2:]), new_pools)
    else:
        new_pools = vredraw(keys)
    del k_sim
    return new_pools, kde, hat_eps


@functools.lru_cache(maxsize=64)
def make_shared_epoch_fn(problem, cfg: AGLMCMCConfig, shared_support: int,
                         redraw_chunk: int = 0):
    """Jitted (and process-cached) shared-adaptation epoch — cached on
    ``(problem, cfg, shared_support, redraw_chunk)`` so repeated driver
    calls reuse one compiled executable instead of re-jitting per call."""
    return jax.jit(functools.partial(_shared_epoch_update, problem, cfg,
                                     shared_support,
                                     redraw_chunk=redraw_chunk))


@functools.lru_cache(maxsize=64)
def make_epoch_fn(problem, cfg: AGLMCMCConfig, num_chains: int,
                  epoch_chunk: int = 0, logp_chunk: int = 0,
                  logprob_backend: str = "auto", interpret: bool = False):
    """Jitted per-chain adaptation epoch, batched over chains:
    ``(keys (C,2), pools, hat_eps (C,)) -> (pools, kdes, hat_eps)``.
    ``epoch_chunk > 0`` runs the chains in sequential ``lax.map`` chunks of
    that size (memory bound for 10^4+ chain runs); ``logp_chunk > 0``
    additionally streams the per-chain KDE ``log_prob`` over support chunks
    (peak (chunk, P, logp_chunk) instead of (chunk, P, P)).  The old pools
    and hat_eps are DONATED — the redraw overwrites them in place, halving
    pool residency (131k chains x 1000 slots is ~3.7 GB per copy).  Shared
    by the scan and fused AGLMCMC drivers; process-cached on its arguments
    so repeated driver calls (benchmarks, test suites) hit one compiled
    epoch.

    ``logprob_backend``: 'xla' evaluates the redrawn pool's KDE log-density
    via vmapped :meth:`KernelDensity.log_prob`; 'pallas' via the fused
    :func:`~glabc_tpu.ops.pallas.kde_logprob_kernel.batched_kde_log_prob`
    kernel (the XLA path's per-chain (P, P) cross matrices are ~400 ms of
    HBM traffic per epoch at 32k chains); 'auto' (default) picks 'pallas'
    on TPU when shapes allow (chain blocks of 128), else 'xla'.  Results
    differ only by reduction order (~1e-4)."""
    C = num_chains
    chunk = epoch_chunk if (epoch_chunk and epoch_chunk < C) else C
    if logprob_backend == "auto":
        use_pallas = (jax.devices()[0].platform == "tpu"
                      and chunk % 128 == 0 and problem.theta_dim <= 8)
    else:
        use_pallas = logprob_backend == "pallas"

    if not use_pallas:
        block_epoch = jax.vmap(
            functools.partial(_epoch_update, problem, cfg,
                              logp_chunk=logp_chunk), in_axes=(0, 0, 0)
        )
    else:
        from ..ops.pallas.kde_logprob_kernel import batched_kde_log_prob
        v_redraw = jax.vmap(functools.partial(_epoch_redraw, problem, cfg),
                            in_axes=(0, 0, 0))
        v_finish = jax.vmap(functools.partial(_pool_from_proposals, problem))

        def block_epoch(keys, pools_, eps_):
            new_theta, kdes, eps2, k_sims = v_redraw(keys, pools_, eps_)
            new_log_q = batched_kde_log_prob(
                kdes, new_theta,
                point_chunk=(logp_chunk if logp_chunk else 512),
                interpret=interpret)
            new_pool = v_finish(k_sims, new_theta, new_log_q)
            return new_pool, kdes, eps2

    if chunk == C:
        return jax.jit(block_epoch, donate_argnums=(1, 2))

    @functools.partial(jax.jit, donate_argnums=(1, 2))
    def epoch_fn(keys, pools_, eps_):
        def reblock(x):
            return x.reshape((C // chunk, chunk) + x.shape[1:])

        def unblock(x):
            return x.reshape((C,) + x.shape[2:])

        out = jax.lax.map(
            lambda args: block_epoch(*args),
            (reblock(keys), jax.tree_util.tree_map(reblock, pools_),
             reblock(eps_)),
        )
        return jax.tree_util.tree_map(unblock, out)

    return epoch_fn


def _build_step(problem, local_proposal, initial_proposal, cfg: AGLMCMCConfig,
                use_kde: bool):
    """Transition kernel for one segment.  ``use_kde`` is static: False for
    the first epoch (current-state density from the initial iSIR proposal,
    ``AGLMCMC.py:137-140``), True afterwards."""
    gf = cfg.global_frequency
    B = cfg.batch_size

    def step(pool: Pool, kde, carry: AGLCarry, _):
        key, k_coin, k_move = jax.random.split(carry.key, 3)
        is_global = jax.random.uniform(k_coin, ()) < gf

        def do_global(k):
            # fresh slice per global move; kk resets each epoch.  The clamp
            # only ever fires on the ~5-sigma binomial overshoot of a
            # fixed-length segment (see module docstring / pool_slack).
            start = jnp.minimum(carry.kk, cfg.pool_slices - 1) * B
            th_slice = jax.lax.dynamic_slice_in_dim(pool.theta, start, B)
            x_slice = jax.lax.dynamic_slice_in_dim(pool.x, start, B)
            dis_slice = jax.lax.dynamic_slice_in_dim(pool.dis, start, B)
            logw_slice = jax.lax.dynamic_slice_in_dim(pool.log_w, start, B)

            if use_kde:
                log_q_old = kde.log_prob(carry.theta)
            else:
                log_q_old = initial_proposal.log_prob(carry.theta)
            log_w_old = (
                problem.prior_log_prob(carry.theta) + carry.log_kernel - log_q_old
            )
            log_w = jnp.concatenate([log_w_old[None], logw_slice])
            ind = categorical_from_log_weights(k, log_w)
            thetas = jnp.concatenate([carry.theta[None], th_slice])
            ys = jnp.concatenate([carry.y[None], x_slice])
            lks = jnp.concatenate(
                [carry.log_kernel[None], problem.kernel_log_prob(dis_slice)]
            )
            return thetas[ind], ys[ind], lks[ind], ind != 0, carry.kk + 1

        def do_local(k):
            theta, y, lk, acc = local_rw_move(
                problem, local_proposal, k, carry.theta, carry.y,
                carry.log_kernel, cfg.support_retries,
            )
            return theta, y, lk, acc, carry.kk

        theta, y, lk, accepted, kk = jax.lax.cond(
            is_global, do_global, do_local, k_move
        )
        counts = carry.counts.update(is_global, accepted)
        new_carry = AGLCarry(theta, y, lk, kk, key, counts)
        return new_carry, StepOut(theta, accepted, is_global)

    return step


@dataclasses.dataclass
class AGLResult(SamplerResult):
    kde: Optional[KernelDensity] = None      # batched over chains
    hat_eps: Optional[np.ndarray] = None     # (C,) final thresholds
    hat_eps_hist: Optional[np.ndarray] = None  # (epochs, C)
    # fused drivers only: the raw packed kernel tiles
    # (theta (d_pad, C), y, log_kernel, [carried pool log-weight]) —
    # final_carry itself is always the scan-path AGLCarry
    fused_state: Optional[tuple] = None


def run_aglmcmc(problem, key, num_ite, theta0, local_proposal,
                initial_isir_proposal, global_frequency=1.0, batch_size=5,
                step_size=200, alpha=0.8, hat_eps_T=0.2, y0=None,
                num_chains: int = 1, on_segment=None, oversample: int = 4,
                support_retries: int = 0, epoch_chunk: int = 0,
                epoch_logp_chunk: int = 0,
                shared_adaptation: bool = False,
                shared_support: int = 4096, mesh=None,
                pool_slack: Optional[int] = None,
                checkpoint_path: Optional[str] = None,
                resume: bool = False) -> AGLResult:
    """``epoch_chunk > 0`` runs the per-chain adaptation epochs (KDE fit +
    oversampled redraw) in sequential chunks of that many chains via
    ``lax.map`` — bounds memory for 10^4+ chain runs; ``epoch_logp_chunk``
    additionally streams the redraw's KDE log_prob over support chunks
    (see :meth:`KernelDensity.log_prob`).

    ``shared_adaptation=True`` switches to cross-chain adaptation: one
    epsilon quantile over all chains' pools and ONE weighted KDE (support
    compressed to ``shared_support`` points by systematic resampling) shared
    by every chain — the scaled algorithm the reference's single chain
    cannot express; each chain keeps its own pool drawn from the shared KDE
    so the per-chain Markov kernel is unchanged in form.

    ``mesh``: a 1-D :class:`jax.sharding.Mesh` shards chains (and their
    pools) over devices.  Per-chain adaptation partitions with zero
    collectives; with ``shared_adaptation=True`` the epoch runs inside
    ``shard_map`` — global epsilon quantile, distributed systematic
    resampling of the shared KDE support, replicated KDE fit
    (:func:`glabc_tpu.parallel.make_sharded_shared_epoch`).  Incompatible
    with ``epoch_chunk``.

    ``pool_slack``: extra pool slices beyond ``step_size`` so gf<1 segments
    never reuse a slice (module docstring); default auto-sizes to ~5 sigma
    of the binomial consumption overshoot (0 at gf=1).

    ``checkpoint_path``/``resume``: the full adaptation state (pools,
    per-chain or shared KDE, ``hat_eps`` trajectory, chain carry, RNG keys)
    is snapshotted at every aligned segment boundary (pre-epoch — the
    pending epoch replays bitwise on resume); ``resume=True`` continues
    bitwise-identically, returning only post-resume history.

    Note: the per-chain adaptation epoch (:func:`make_epoch_fn`) DONATES
    its pool/hat_eps arguments — after each epoch the previous pool buffers
    are invalid.  The driver never reuses them; callers driving
    ``make_epoch_fn`` directly (custom benchmarks) must pass fresh arrays
    per call."""
    if pool_slack is None:
        pool_slack = default_pool_slack(step_size, global_frequency)
    cfg = AGLMCMCConfig(global_frequency, batch_size, step_size, alpha,
                        hat_eps_T, oversample, support_retries, pool_slack)
    P = batch_size * cfg.pool_slices
    C = num_chains
    key = jnp.asarray(key)
    k_chain, k_pool, k_loop = jax.random.split(key, 3)

    # initial chain state
    cc = init_chain_carry(problem, k_chain, theta0, y0, num_chains)
    carry = AGLCarry(cc.theta, cc.y, cc.log_kernel,
                     jnp.zeros((C,), jnp.int32), cc.key, cc.counts)
    theta_init = np.asarray(carry.theta)[:, None, :]

    # initial per-chain pools from the parametric iSIR proposal (:84-112)
    @jax.jit
    def init_pools(k):
        def one(kk):
            k1, k2 = jax.random.split(kk)
            th, log_q = initial_isir_proposal.forward(k1, P)
            return _pool_from_proposals(problem, k2, th, log_q)
        return jax.vmap(one)(jax.random.split(k, C))

    pools = init_pools(k_pool)

    if mesh is not None:
        from ..parallel.mesh import shard_chains
        assert C % mesh.devices.size == 0, (
            "num_chains must divide by the mesh size")
        assert not epoch_chunk, "epoch_chunk is incompatible with mesh"
        carry = shard_chains(carry, mesh)
        pools = shard_chains(pools, mesh)

    # placeholder KDE (uniform weights over the initial pool) so the first
    # segment's step signature matches later ones; it is unused (use_kde=False)
    if shared_adaptation:
        kdes = KernelDensity.fit(
            pools.theta[0][: min(P, 4096)]
        )
    else:
        kdes = jax.vmap(lambda th: KernelDensity.fit(th))(pools.theta)

    if shared_adaptation:
        if mesh is not None:
            from ..parallel.sharded import make_sharded_shared_epoch
            shared_epoch = make_sharded_shared_epoch(
                problem, cfg, shared_support, mesh
            )
        else:
            shared_epoch = make_shared_epoch_fn(
                problem, cfg, shared_support,
                redraw_chunk=(epoch_chunk if epoch_chunk
                              and epoch_chunk < C else 0))
        epoch_fn = None
    else:
        epoch_fn = make_epoch_fn(problem, cfg, C, epoch_chunk,
                                 epoch_logp_chunk)

    kde_axis = None if shared_adaptation else 0

    def make_segment(use_kde: bool):
        step = _build_step(problem, local_proposal, initial_isir_proposal,
                           cfg, use_kde)
        batched = jax.vmap(step, in_axes=(0, kde_axis, 0, None))

        @functools.partial(jax.jit, static_argnames=("length",))
        def segment(pool_, kde_, carry_, length):
            return jax.lax.scan(
                functools.partial(batched, pool_, kde_), carry_, None,
                length=length,
            )
        return segment

    seg_first = make_segment(False)
    seg_rest = make_segment(True)

    seg_len = (
        max(1, int(round(step_size / global_frequency)))
        if global_frequency > 0 else (num_ite - 1)
    )
    hat_eps = (jnp.float32(1.0e6) if shared_adaptation
               else jnp.full((C,), 1.0e6, jnp.float32))
    hat_eps_hist = []
    blocks = []
    done = 0
    total = num_ite - 1
    n_epochs = 0
    pending_epoch = False

    from ._fused_io import restore_epoch_ckpt, save_epoch_ckpt
    ckpt_meta = {"sampler": "aglmcmc", "num_chains": C,
                 "theta_dim": problem.theta_dim, "seg_len": seg_len,
                 "pool_rows": P, "shared": int(shared_adaptation)}
    restored = (restore_epoch_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is not None:
        state, done = restored
        pools, kdes, hat_eps, carry, k_loop = (
            state["pools"], state["kdes"], state["hat_eps"], state["carry"],
            state["k_loop"])
        n_epochs = int(state["n_epochs"])
        hat_eps_hist = [np.asarray(x) for x in
                        np.asarray(state["hat_eps_hist"])]
        pending_epoch = True
        theta_init = None
        if mesh is not None:
            from ..parallel.mesh import shard_chains
            carry = shard_chains(carry, mesh)
            pools = shard_chains(pools, mesh)

    while done < total:
        if pending_epoch:
            k_loop, k_ep = jax.random.split(k_loop)
            if shared_adaptation:
                pools, kdes, hat_eps = shared_epoch(k_ep, pools, hat_eps)
            else:
                pools, kdes, hat_eps = epoch_fn(
                    jax.random.split(k_ep, C), pools, hat_eps
                )
            hat_eps_hist.append(np.asarray(hat_eps))
            n_epochs += 1
            # fresh pool -> cursor back to slice 0 (reference AGLMCMC.py:249
            # resets kk after the refit; elementwise to keep any sharding)
            carry = carry._replace(kk=carry.kk * 0)
            pending_epoch = False
        take = min(seg_len, total - done)
        seg = seg_first if n_epochs == 0 else seg_rest
        carry, outs = seg(pools, kdes, carry, take)
        blocks.append(np.moveaxis(np.asarray(outs.theta), 0, 1))
        if on_segment is not None:
            on_segment(blocks[-1], done)
        done += take
        if take == seg_len:
            if done < total:
                pending_epoch = True
            if checkpoint_path is not None:
                save_epoch_ckpt(
                    checkpoint_path,
                    {"pools": pools, "kdes": kdes, "hat_eps": hat_eps,
                     "carry": carry, "k_loop": k_loop, "n_epochs": n_epochs,
                     "hat_eps_hist": (np.stack(hat_eps_hist)
                                      if hat_eps_hist
                                      else np.zeros((0,), np.float32))},
                    done, take, seg_len, meta=ckpt_meta)

    head = [theta_init] if theta_init is not None else []
    thetas = (np.concatenate(head + blocks, axis=1) if blocks or head
              else np.zeros((C, 0, problem.theta_dim), np.float32))
    return AGLResult(
        thetas=thetas, counts=carry.counts, final_carry=carry,
        kde=kdes, hat_eps=np.asarray(hat_eps),
        hat_eps_hist=np.asarray(hat_eps_hist) if hat_eps_hist else None,
    )
