"""High-level driver for the fused Pallas AGLMCMC sampler.

Fuses the between-epoch transition loop of AGLMCMC (reference
``AGLMCMC.py:124-164``) into the :class:`~glabc_tpu.ops.pallas.pool_isir_kernel.PoolISIR`
Pallas kernel at the canonical ``global_frequency = 1``: every transition is
an iSIR move over a precomputed pool slice, so the in-kernel step is pure
data selection (see the kernel module docstring) and the adaptation epochs —
epsilon annealing, weighted-KDE refit, oversampled pool redraw
(``AGLMCMC.py:170-249``) — run on the XLA path between ``pallas_call``s,
reusing the *same* ``_epoch_update`` as the scan path
(:func:`glabc_tpu.samplers.aglmcmc.run_aglmcmc`), which guarantees identical
annealing/refit semantics.

The gf=1 driver is problem-agnostic: pool simulation and weighting happen on
the XLA path (``_pool_from_proposals``), so any :class:`ABCProblem` works —
not just the Mixture family.

For ``global_frequency < 1`` (local RW moves mixed in, ``AGLMCMC.py:255-289``)
the driver routes to :class:`~glabc_tpu.ops.pallas.pool_isir_mixed_kernel.PoolISIRMixed`,
which fuses the per-chain coin, the Mixture-family local move, and the
reference's per-global-move current-state proposal density
(``KDE.log_prob(Theta_old)``, ``AGLMCMC.py:137-141``) against a VMEM-resident
shared KDE.  That requires ``shared_adaptation`` semantics (one cross-chain
KDE — its support fits on-chip; per-chain KDEs cannot) and a Mixture-family
problem; other configurations stay on the scan path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.mixture_kernel import fused_state_init
from ..ops.pallas.pool_isir_kernel import (
    PoolISIR,
    pack_pool_logw,
    pack_pool_theta,
)
from ..ops.pallas.pool_isir_mixed_kernel import (
    PoolISIRMixed,
    resident_from_gaussian,
    resident_from_kde,
)
from .aglmcmc import (
    AGLMCMCConfig,
    AGLResult,
    _pool_from_proposals,
    make_epoch_fn,
    make_shared_epoch_fn,
)
from .base import MoveCounts
from .chain import init_chain_carry

__all__ = ["run_aglmcmc_fused", "run_aglmcmc_fused_mixed"]

_SUB = 8


# Driver helper factories are lru_cached on their STATIC configuration
# (problem identity + shapes), with distributions/pools passed as traced
# pytree arguments — so repeated driver calls (benchmarks, epochs, test
# suites) reuse one compiled executable per helper instead of re-jitting
# fresh closures every call (the kernels themselves are cached via
# ConfigHashable on the kernel classes).

class _AsyncBlocks:
    """Deferred device->host history gather.

    ``np.asarray(hist)`` right after a segment blocks the host on the
    device->host copy BEFORE the next segment is even dispatched, serializing
    transfer and compute.  Instead, start a non-blocking copy per segment
    (``copy_to_host_async``) and materialize all blocks once at the end —
    the device runs segment ``k+1`` while segment ``k``'s history streams
    out.  Used whenever no ``on_segment`` callback demands synchronous
    blocks.

    ``add(hist, take)`` slices the kernel's padded ``(T, d_pad, C)`` buffer
    down to ``(take, d, C)`` ON DEVICE before starting the copy: at d=2 the
    sublane pad is 8, so copying the raw buffer moves 4x the real bytes —
    and the device->host link (≈30 MB/s over the axon tunnel) is the
    end-to-end bound of every history-on adaptive run.

    Only ``max_pending`` device buffers are held at once (a segment's
    history can be ~0.5 GB of HBM; keeping all of them alive until the end
    OOMs long runs) — older segments are materialized as soon as a newer
    one is enqueued, by which point their async copy has had a full
    segment of compute to complete.

    ``thin``/``dtype`` compress the transfer on device before the copy
    starts: ``thin=k`` keeps only iterations ``i`` with ``i % k == 0``
    (globally consistent across segments — ``add`` takes the segment's
    global iteration offset), and ``dtype=jnp.bfloat16`` halves the bytes
    (chains are posterior samples; 8 mantissa bits are ample for the f64
    summary casts downstream).  Both matter because the device->host link
    (~30 MB/s tunnel) bounds every history-on adaptive run."""

    def __init__(self, d: int, max_pending: int = 2, post=None,
                 thin: int = 1, dtype=None):
        self._d = d
        self._max = max(1, int(max_pending))
        # materialized layout: (chains, take, d) by default
        self._post = post or (lambda a: np.moveaxis(a, 2, 0))
        self._thin = max(1, int(thin))
        self._dtype = dtype
        self._pending: list = []
        self._done: list = []

    def _materialize(self, h) -> None:
        self._done.append(self._post(np.asarray(h)))

    def _enqueue(self, dev) -> None:
        try:
            dev.copy_to_host_async()
        except (AttributeError, RuntimeError):
            pass  # multi-device arrays: np.asarray below still works
        self._pending.append(dev)
        while len(self._pending) > self._max:
            self._materialize(self._pending.pop(0))

    def add(self, hist_dev, take: int, done: int = 0) -> None:
        """Enqueue segment history ``hist_dev (T, d_pad, C)``; row ``r``
        is global iteration ``done + 1 + r``."""
        t = self._thin
        if t > 1:
            r0 = (-(done + 1)) % t
            if r0 >= take:
                return
            dev = hist_dev[r0:take:t, : self._d, :]
        else:
            dev = hist_dev[:take, : self._d, :]
        if self._dtype is not None:
            dev = dev.astype(self._dtype)
        self._enqueue(dev)

    def add_raw(self, dev) -> None:
        """Enqueue an already-sliced device array (``post`` still applies)."""
        self._enqueue(dev)

    def blocks(self) -> list:
        while self._pending:
            self._materialize(self._pending.pop(0))
        return self._done


@jax.jit
def _acc_row(acc, row, frac):
    """``acc (C,) += row[0] * frac`` on device — per-segment count
    accumulation without a host sync (a ``np.asarray(moved)`` here queues
    behind the in-flight history copy and stalls the dispatch pipeline a
    full transfer per segment).  f32 is exact for integer counts < 2^24;
    ``frac`` < 1 only on the ragged final segment (documented pro-rata
    approximation).  Drivers call :func:`_check_count_range` so runs long
    enough to break exactness warn instead of silently drifting."""
    return acc + row[0] * frac


def _history_opts(thin: int, history_dtype, on_segment):
    """Validate/normalize the fused drivers' history-compression options.

    Returns ``(thin, dtype-or-None)``.  ``history_dtype='bfloat16'`` halves
    the device->host bytes (the ~30 MB/s tunnel bounds history-on runs);
    ``thin=k`` keeps iterations ``i % k == 0`` (plus the initial state).
    Both act on the on-device slice before the async copy, so they are
    incompatible with ``on_segment`` (which receives synchronous
    full-resolution float32 blocks)."""
    thin = max(1, int(thin))
    dt = None
    if history_dtype is not None:
        dt = jnp.dtype(history_dtype)
        if dt == jnp.dtype(jnp.float32):
            dt = None
        elif dt != jnp.dtype(jnp.bfloat16):
            raise ValueError(
                f"history_dtype must be float32 or bfloat16, got "
                f"{history_dtype!r}")
    if on_segment is not None and (thin > 1 or dt is not None):
        raise ValueError(
            "thin/history_dtype compress the async history transfer and "
            "are incompatible with on_segment (which gets synchronous "
            "full-resolution float32 blocks)")
    return thin, dt


def _check_count_range(num_ite: int) -> None:
    """f32 count accumulators (:func:`_acc_row`) are exact only below
    2^24; per-chain attempt counts are bounded by ``num_ite``."""
    if num_ite > 2 ** 24:
        import warnings
        warnings.warn(
            f"num_ite={num_ite} exceeds 2^24: on-device float32 move-count "
            "accumulators lose integer exactness above 16,777,216 and "
            "MoveCounts may drift (history/posteriors are unaffected). "
            "Split the run into segments via checkpoint/resume.",
            RuntimeWarning, stacklevel=3)


def _fused_final_carry(problem, d: int, theta_k, y_cur, logk, counts, key):
    """Normalize a fused driver's packed state tiles to the scan path's
    :class:`~glabc_tpu.samplers.aglmcmc.AGLCarry` (VERDICT r3 weak #7 — one
    carry type across scan and fused drivers).

    ``kk`` is 0 (fused segments always start at a fresh pool) and ``key`` is
    the scan path's per-chain fold-in of the driver key; both are
    *reconstructed*, not carried through the kernel — resume uses the packed
    checkpoint state, never this normalized view."""
    from .aglmcmc import AGLCarry

    theta = jnp.asarray(np.asarray(theta_k)[:d, :].T)      # (C, d)
    C = theta.shape[0]
    keys = jax.vmap(jax.random.fold_in, (None, 0))(jnp.asarray(key),
                                                   jnp.arange(C))
    return AGLCarry(theta, jnp.asarray(y_cur), jnp.asarray(logk),
                    jnp.zeros((C,), jnp.int32), keys, counts)


@functools.lru_cache(maxsize=64)
def _make_init_pools(problem, P: int, C: int):
    @jax.jit
    def init_pools(proposal, k):
        def one(kk):
            k1, k2 = jax.random.split(kk)
            th, log_q = proposal.forward(k1, P)
            return _pool_from_proposals(problem, k2, th, log_q)
        return jax.vmap(one)(jax.random.split(k, C))
    return init_pools


@functools.lru_cache(maxsize=64)
def _make_pack(T: int, B: int, d_pad: int, problem=None):
    """Pool -> kernel-layout packer; with ``problem`` also packs the
    datasets and target-epsilon kernel values (the mixed kernel's extra
    streams)."""
    if problem is None:
        @jax.jit
        def pack(pools_):
            return (pack_pool_theta(pools_.theta, T, B, d_pad),
                    pack_pool_logw(pools_.log_w, T, B))
    else:
        @jax.jit
        def pack(pools_):
            return (pack_pool_theta(pools_.theta, T, B, d_pad),
                    pack_pool_theta(pools_.x, T, B, d_pad),
                    pack_pool_logw(pools_.log_w, T, B),
                    pack_pool_logw(
                        problem.kernel_log_prob(pools_.dis), T, B))
    return pack


@functools.lru_cache(maxsize=64)
def _make_gf1_helpers(problem, d: int, d_pad: int, C: int):
    @jax.jit
    def state_init(proposal, theta_cd, logk):
        th = jnp.zeros((d_pad, C), jnp.float32).at[:d].set(theta_cd.T)
        logw = (problem.prior_log_prob(theta_cd) + logk
                - proposal.log_prob(theta_cd))[None, :]
        return th, logw

    @jax.jit
    def logw_kde(kdes, theta_k, logk):
        th = theta_k[:d].T                                       # (C, d)
        logq = jax.vmap(lambda kde, x: kde.log_prob(x))(kdes, th)
        return (problem.prior_log_prob(th) + logk - logq)[None, :]

    @jax.jit
    def resolve(pools_, sel, y_prev, logk_prev):
        """Gather the last-selected candidate's dataset/kernel value from
        the pool (the kernel records only the flat slot index)."""
        s = sel[0]                                               # (C,)
        idx = jnp.maximum(s, 0.0).astype(jnp.int32)
        y_sel = jnp.take_along_axis(pools_.x, idx[:, None, None],
                                    axis=1)[:, 0]
        dis_sel = jnp.take_along_axis(pools_.dis, idx[:, None], axis=1)[:, 0]
        logk_sel = problem.kernel_log_prob(dis_sel)
        moved = s >= 0.0
        return (jnp.where(moved[:, None], y_sel, y_prev),
                jnp.where(moved, logk_sel, logk_prev))

    return state_init, logw_kde, resolve


def run_aglmcmc_fused(problem, key, num_ite, theta0, initial_isir_proposal,
                      *, batch_size: int = 5, step_size: int = 200,
                      alpha: float = 0.8, hat_eps_T: float = 0.2,
                      oversample: int = 4, num_chains: int = 4096,
                      block_chains: int = 1024, collect_history: bool = True,
                      y0=None, seed: int | None = None, epoch_chunk: int = 0,
                      epoch_logp_chunk: int = 0,
                      on_segment=None, interpret: bool = False,
                      mesh=None, global_frequency: float = 1.0,
                      lp_scale: float = 0.35, shared_support: int = 4096,
                      support_chunk: int = 512,
                      checkpoint_path: str | None = None,
                      resume: bool = False,
                      pack_chunk: int = 0,
                      thin: int = 1,
                      history_dtype=None) -> AGLResult:
    """AGLMCMC via the fused pool-iSIR Pallas kernels.

    ``global_frequency < 1`` dispatches to
    :func:`run_aglmcmc_fused_mixed` (per-chain coin + in-kernel Mixture
    local move + resident shared-KDE proposal density; see that function
    for its requirements); the remainder of this docstring describes the
    canonical gf = 1 pool-iSIR path.

    Segments are ``step_size`` transitions (= one pool) per ``pallas_call``;
    between segments the per-chain adaptation epoch runs on the XLA path and
    the new carry log-weight is recomputed under the fresh KDE — exactly the
    value the scan path's step recomputes each iteration.  Returns an
    :class:`AGLResult` matching the scan path's conventions (chains of
    length ``num_ite`` with the initial state at index 0, per-chain
    ``hat_eps`` trajectory, final batched KDE).

    Note: the kernel always runs ``step_size`` transitions per launch; if
    ``num_ite - 1`` is not a multiple, the recorded history is still exactly
    ``num_ite`` long but the final carry is up to ``step_size - 1``
    transitions ahead of the last recorded state and the final segment's
    move counts are scaled pro-rata (same contract as
    :func:`run_glmcmc_fused`).

    ``mesh``: a 1-D :class:`jax.sharding.Mesh` shards the chain axis —
    state rows, per-chain pools, and the adaptation epochs (which are
    chain-elementwise) all partition with zero collectives; the kernel runs
    per-device inside ``shard_map`` with tiled PRNG streams
    (:meth:`PoolISIR.make_sharded_run`).  Requires ``num_chains`` divisible
    by ``block_chains * mesh size``.

    ``pack_chunk``: pack and launch the segment in sub-segments of this
    many steps (must divide ``step_size``): only a
    ``(pack_chunk, B, d_pad, C)`` slice of the pool is ever held in the
    kernel layout — at 131k chains the full packed pool alone is ~4 GB, so
    sub-packing is what lifts the adaptive chain-count HBM ceiling.  The
    Markov kernel is unchanged (same pool slices in the same order; PRNG
    streams are per-launch, so trajectories differ bitwise from the
    unchunked launch but are equally valid).  0 = pack the whole segment
    (bitwise-compatible with earlier releases).

    ``thin``/``history_dtype``: compress the returned history on device
    before the async device->host copy — ``thin=k`` keeps iterations
    ``i % k == 0`` plus the initial state (``1 + (num_ite-1)//k`` rows);
    ``history_dtype='bfloat16'`` halves the bytes.  The ~30 MB/s tunnel
    transfer bounds history-on runs, so these directly raise end-to-end
    throughput.  Incompatible with ``on_segment``.

    Note: the adaptation epoch (:func:`~glabc_tpu.samplers.aglmcmc.make_epoch_fn`)
    DONATES its pool/hat_eps arguments; previous-epoch pool buffers are
    invalid after each epoch (the driver never reuses them)."""
    if global_frequency < 1.0:
        return run_aglmcmc_fused_mixed(
            problem, key, num_ite, theta0, initial_isir_proposal,
            global_frequency=global_frequency, batch_size=batch_size,
            step_size=step_size, alpha=alpha, hat_eps_T=hat_eps_T,
            oversample=oversample, num_chains=num_chains,
            block_chains=block_chains, collect_history=collect_history,
            y0=y0, seed=seed, on_segment=on_segment, interpret=interpret,
            mesh=mesh, lp_scale=lp_scale, shared_support=shared_support,
            support_chunk=support_chunk, checkpoint_path=checkpoint_path,
            resume=resume, thin=thin, history_dtype=history_dtype)
    d = problem.theta_dim
    d_pad = max(_SUB, ((d + _SUB - 1) // _SUB) * _SUB)
    T, B, C = int(step_size), int(batch_size), int(num_chains)
    P = T * B
    _check_count_range(num_ite)
    cfg = AGLMCMCConfig(1.0, B, T, alpha, hat_eps_T, oversample, 0, 0)

    sub_T = int(pack_chunk) if pack_chunk else T
    if T % sub_T:
        raise ValueError(f"pack_chunk={pack_chunk} must divide "
                         f"step_size={T}")
    n_sub = T // sub_T

    kern = PoolISIR(d, batch_size=B, steps_per_call=sub_T,
                    block_chains=block_chains,
                    collect_history=collect_history, interpret=interpret)

    key = jnp.asarray(key)
    k_chain, k_pool, k_loop = jax.random.split(key, 3)
    cc = init_chain_carry(problem, k_chain, theta0, y0, C)

    pools = _make_init_pools(problem, P, C)(initial_isir_proposal, k_pool)

    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import CHAIN_AXIS
        n_dev = mesh.devices.size
        assert C % (block_chains * n_dev) == 0, (
            f"num_chains must divide by {block_chains * n_dev}")
        chain_sh = NamedSharding(mesh, P(CHAIN_AXIS))
        pools = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, chain_sh), pools)
        cc = cc._replace(
            theta=jax.device_put(cc.theta, chain_sh),
            y=jax.device_put(cc.y, chain_sh),
            log_kernel=jax.device_put(cc.log_kernel, chain_sh))
        kern_run = kern.make_sharded_run(mesh)
    else:
        kern_run = kern.run

    pack = _make_pack(sub_T, B, d_pad)
    state_init, logw_kde, resolve = _make_gf1_helpers(problem, d, d_pad, C)
    epoch_fn = make_epoch_fn(problem, cfg, C, epoch_chunk,
                             epoch_logp_chunk)

    theta_k, logw_k = state_init(initial_isir_proposal, cc.theta,
                                 cc.log_kernel)
    y_cur, logk = cc.y, cc.log_kernel
    theta_init_row = np.asarray(cc.theta)[:, None, :]

    if seed is None:
        seed = int(jax.random.randint(jax.random.fold_in(key, 7), (),
                                      0, 2**31 - 1))

    hat_eps = jnp.full((C,), 1.0e6, jnp.float32)
    hat_eps_hist: list[np.ndarray] = []
    blocks: list[np.ndarray] = []
    thin, hist_dt = _history_opts(thin, history_dtype, on_segment)
    async_blocks = _AsyncBlocks(d, thin=thin, dtype=hist_dt)
    if hist_dt is not None:
        theta_init_row = theta_init_row.astype(hist_dt)
    g_acc = jnp.zeros((C,), jnp.float32)
    kdes = None
    done, steps_run, ep = 0, 0, 0
    total = num_ite - 1
    pending_epoch = False

    from ._fused_io import restore_epoch_ckpt, save_epoch_ckpt
    ckpt_meta = {"sampler": "aglmcmc_fused", "num_chains": C,
                 "theta_dim": d, "steps_per_call": T, "batch_size": B,
                 "block_chains": block_chains}
    restored = (restore_epoch_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is not None:
        state, done = restored
        pools, kdes, hat_eps = state["pools"], state["kdes"], state["hat_eps"]
        theta_k, logw_k = state["theta_k"], state["logw_k"]
        y_cur, logk = state["y_cur"], state["logk"]
        g_acc = jnp.asarray(state["g_acc"], jnp.float32)
        steps_run, ep = int(state["steps_run"]), int(state["ep"])
        seed, k_loop = int(state["seed"]), state["k_loop"]
        hat_eps_hist = [np.asarray(x) for x in
                        np.asarray(state["hat_eps_hist"])]
        pending_epoch = True
        theta_init_row = None
        if mesh is not None:
            pools = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, chain_sh), pools)

    def sub_pool(j):
        if n_sub == 1:
            return pools
        lo = j * sub_T * B
        return jax.tree_util.tree_map(
            lambda x: jax.lax.slice_in_dim(x, lo, lo + sub_T * B, axis=1),
            pools)

    ptheta, plogw = None, None
    while done < total:
        if pending_epoch:
            k_loop, k_ep = jax.random.split(k_loop)
            pools, kdes, hat_eps = epoch_fn(
                jax.random.split(k_ep, C), pools, hat_eps
            )
            hat_eps_hist.append(np.asarray(hat_eps))
            ep += 1
            ptheta, plogw = None, None
            logw_k = logw_kde(kdes, theta_k, logk)
            pending_epoch = False
        j = (done % T) // sub_T
        sp = sub_pool(j)
        if n_sub > 1 or ptheta is None:
            ptheta, plogw = pack(sp)
        take = min(sub_T, total - done)
        theta_k, logw_k, sel, moved, hist = kern_run(
            np.int32((seed + ep * n_sub + j) % (2**31 - 1)), ptheta, plogw,
            theta_k, logw_k,
        )
        if collect_history:
            if on_segment is not None:
                block = np.moveaxis(np.asarray(hist)[:take, :d, :], 2, 0)
                on_segment(block, done)
                blocks.append(block)
            else:
                async_blocks.add(hist, take, done)
        y_cur, logk = resolve(sp, sel, y_cur, logk)
        g_acc = _acc_row(g_acc, moved, take / sub_T)
        steps_run += take
        done += take
        if take == sub_T and done % T == 0:
            if done < total:
                pending_epoch = True
            if checkpoint_path is not None:
                save_epoch_ckpt(
                    checkpoint_path,
                    {"pools": pools, "kdes": kdes, "hat_eps": hat_eps,
                     "theta_k": theta_k, "logw_k": logw_k, "y_cur": y_cur,
                     "logk": logk, "g_acc": g_acc, "steps_run": steps_run,
                     "ep": ep, "seed": seed, "k_loop": k_loop,
                     "hat_eps_hist": (np.stack(hat_eps_hist)
                                      if hat_eps_hist
                                      else np.zeros((0,), np.float32))},
                    done, sub_T, sub_T, meta=ckpt_meta)

    if collect_history and on_segment is None:
        blocks = async_blocks.blocks()
    head = [theta_init_row] if theta_init_row is not None else []
    if collect_history and (head or blocks):
        thetas = np.concatenate(head + blocks, axis=1)
    elif head:
        thetas = theta_init_row
    else:
        thetas = np.zeros((C, 0, d), np.float32)
    att = np.full((C,), steps_run, np.int32)
    counts = MoveCounts(
        global_attempts=att,
        global_accepts=np.rint(np.asarray(g_acc)).astype(np.int32),
        local_attempts=np.zeros((C,), np.int32),
        local_accepts=np.zeros((C,), np.int32),
    )
    return AGLResult(
        thetas=thetas, counts=counts,
        final_carry=_fused_final_carry(problem, d, theta_k, y_cur, logk,
                                       counts, key),
        kde=kdes, hat_eps=np.asarray(hat_eps),
        hat_eps_hist=np.asarray(hat_eps_hist) if hat_eps_hist else None,
        fused_state=(theta_k, y_cur, logk, logw_k),
    )


def run_aglmcmc_fused_mixed(problem, key, num_ite, theta0,
                            initial_isir_proposal, *,
                            global_frequency: float, batch_size: int = 5,
                            step_size: int = 200, alpha: float = 0.8,
                            hat_eps_T: float = 0.2, oversample: int = 4,
                            num_chains: int = 4096,
                            block_chains: int = 1024,
                            collect_history: bool = True, y0=None,
                            seed: int | None = None, on_segment=None,
                            interpret: bool = False, mesh=None,
                            lp_scale: float = 0.35,
                            shared_support: int = 4096,
                            support_chunk: int = 512,
                            redraw_chunk: int = 512,
                            checkpoint_path: str | None = None,
                            resume: bool = False,
                            tile_program=None,
                            thin: int = 1,
                            history_dtype=None) -> AGLResult:
    """AGLMCMC at ``global_frequency < 1`` via the fused
    :class:`~glabc_tpu.ops.pallas.pool_isir_mixed_kernel.PoolISIRMixed`
    kernel (per-chain coin, in-kernel Mixture local RW move, in-kernel
    current-state proposal density; reference ``AGLMCMC.py:124-289``).

    Requirements (falls back is NOT automatic — a clear error is raised):

    * Mixture-family problem (``problem._noise_std`` set: simulator
      ``y = |theta| + sigma z``, standard-normal prior, Euclidean
      discrepancy, Gaussian epsilon-kernel) — the local move is fused —
      **or** an explicit ``tile_program``
      (:class:`~glabc_tpu.ops.pallas.generic_kernel.TileProgram` with
      ``prior_lp``) lowering an arbitrary problem's local move, simulator,
      prior, and epsilon-kernel to tile callables (the reference's local
      move is problem-agnostic, ``AGLMCMC.py:255-272``; see
      ``ma2_tile_program`` for a non-Mixture example);
    * shared (cross-chain) adaptation: one epsilon quantile over all pools
      and ONE ``shared_support``-point KDE per epoch
      (:func:`glabc_tpu.samplers.aglmcmc._shared_epoch_update`), because
      only a shared KDE support fits in VMEM for the in-kernel density.
      Per-chain adaptation at gf<1 stays on the scan path
      (:func:`glabc_tpu.samplers.aglmcmc.run_aglmcmc`).

    Pool cadence is slice-per-step (one slice per *transition*, consumed
    only on global coins — unconsumed slices are skipped; see the kernel
    module docstring for why this is statistically exact), so segments are
    ``seg_len = round(step_size / gf)`` steps with ``seg_len * batch_size``
    pool draws per epoch, and the epoch trains on the full pool exactly
    like the reference (``AGLMCMC.py:199-204``).

    ``initial_isir_proposal`` must be a diagonal Gaussian (reference
    ``MCMCRunner.py:66``): its density is evaluated in-kernel for the first
    epoch (``AGLMCMC.py:137-138``).
    """
    d = problem.theta_dim
    _check_count_range(num_ite)
    if tile_program is None:
        sigma = getattr(problem, "_noise_std", None)
        if sigma is None:
            raise ValueError(
                "run_aglmcmc_fused_mixed needs a Mixture-family problem "
                "(with a Gaussian simulator noise scale) for the in-kernel "
                "local move, or an explicit tile_program= lowering the "
                "problem to tile callables (see "
                "glabc_tpu.ops.pallas.generic_kernel); run_aglmcmc (scan) "
                "covers arbitrary problems without one")
        if problem.y_dim != d:
            raise ValueError(
                "Mixture-family kernels require y_dim == theta_dim")
        y_rows = d
    else:
        sigma = 0.0
        y_rows = int(tile_program.y_rows)
    loc = getattr(initial_isir_proposal, "loc", None)
    log_scale = getattr(initial_isir_proposal, "log_scale", None)
    if loc is None or log_scale is None:
        raise ValueError(
            "initial_isir_proposal must be a DiagGaussian (loc/log_scale) "
            "— its density is evaluated in-kernel for the first epoch")

    gf = float(global_frequency)
    B, C = int(batch_size), int(num_chains)
    seg_len = max(1, int(round(step_size / gf)))
    P = seg_len * B
    # cfg.pool_slices == seg_len so the shared epoch redraws P = seg_len*B
    cfg = AGLMCMCConfig(gf, B, step_size, alpha, hat_eps_T, oversample, 0,
                        seg_len - step_size)

    kern = PoolISIRMixed(
        d, problem.y_obs if tile_program is None else None,
        epsilon=problem.epsilon, sigma=sigma,
        global_frequency=gf, batch_size=B, steps_per_call=seg_len,
        lp_scale=lp_scale, block_chains=block_chains,
        n_support=shared_support, support_chunk=support_chunk,
        collect_history=collect_history, interpret=interpret,
        program=tile_program)
    d_pad = kern.d_pad

    key = jnp.asarray(key)
    k_chain, k_pool, k_loop = jax.random.split(key, 3)
    if tile_program is None:
        theta_k, y_k, logk_k = fused_state_init(problem, k_chain, theta0, C,
                                                d_pad, y0=y0)
    else:
        from .fused_program import program_state_init
        theta_k, y_k, logk_k = program_state_init(problem, k_chain, theta0,
                                                  C, d_pad, y_rows, y0=y0)
    theta_init_row = np.asarray(theta_k)[:d, :].T[:, None, :]  # (C, 1, d)

    pools = _make_init_pools(problem, P, C)(initial_isir_proposal, k_pool)

    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PS

        from ..parallel.mesh import CHAIN_AXIS
        from ..parallel.sharded import make_sharded_shared_epoch
        n_dev = mesh.devices.size
        assert C % (block_chains * n_dev) == 0, (
            f"num_chains must divide by {block_chains * n_dev}")
        chain_sh = NamedSharding(mesh, PS(CHAIN_AXIS))
        pools = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, chain_sh), pools)
        col_sh = NamedSharding(mesh, PS(None, CHAIN_AXIS))
        theta_k, y_k, logk_k = (jax.device_put(x, col_sh)
                                for x in (theta_k, y_k, logk_k))
        kern_run = kern.make_sharded_run(mesh)
        epoch_fn = make_sharded_shared_epoch(problem, cfg, shared_support,
                                             mesh)
    else:
        kern_run = kern.run
        # clamp to the largest divisor of C (chain counts like 1280 with
        # the default 512 would otherwise fail the epoch's divisibility
        # check); 0 = unchunked
        if redraw_chunk and redraw_chunk < C:
            while C % redraw_chunk:
                redraw_chunk -= 1
        else:
            redraw_chunk = 0
        epoch_fn = make_shared_epoch_fn(
            problem, cfg, shared_support, redraw_chunk=redraw_chunk)

    pack = _make_pack(seg_len, B, d_pad, problem)

    resident = resident_from_gaussian(
        loc, jnp.exp(jnp.asarray(log_scale)), d_pad, kern.n_pad)

    if seed is None:
        seed = int(jax.random.randint(jax.random.fold_in(key, 7), (),
                                      0, 2**31 - 1))

    hat_eps = jnp.float32(1.0e6)
    hat_eps_hist: list[np.ndarray] = []
    blocks: list[np.ndarray] = []
    thin, hist_dt = _history_opts(thin, history_dtype, on_segment)
    async_blocks = _AsyncBlocks(d, thin=thin, dtype=hist_dt)
    if hist_dt is not None:
        theta_init_row = theta_init_row.astype(hist_dt)
    g_att = jnp.zeros((C,), jnp.float32)
    g_acc = jnp.zeros((C,), jnp.float32)
    l_acc = jnp.zeros((C,), jnp.float32)
    kde = None
    done, steps_run, ep = 0, 0, 0
    total = num_ite - 1
    pending_epoch = False

    from ._fused_io import restore_epoch_ckpt, save_epoch_ckpt
    ckpt_meta = {"sampler": "aglmcmc_fused_mixed", "num_chains": C,
                 "theta_dim": d, "seg_len": seg_len, "batch_size": B,
                 "block_chains": block_chains,
                 "shared_support": shared_support}
    restored = (restore_epoch_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is not None:
        state, done = restored
        pools, kde, hat_eps = state["pools"], state["kde"], state["hat_eps"]
        theta_k, y_k, logk_k = state["theta_k"], state["y_k"], state["logk_k"]
        g_att = jnp.asarray(state["g_att"], jnp.float32)
        g_acc = jnp.asarray(state["g_acc"], jnp.float32)
        l_acc = jnp.asarray(state["l_acc"], jnp.float32)
        steps_run, ep = int(state["steps_run"]), int(state["ep"])
        seed, k_loop = int(state["seed"]), state["k_loop"]
        hat_eps_hist = [np.asarray(x) for x in
                        np.asarray(state["hat_eps_hist"])]
        pending_epoch = True
        theta_init_row = None
        if mesh is not None:
            pools = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, chain_sh), pools)

    packed = pack(pools)
    while done < total:
        if pending_epoch:
            k_loop, k_ep = jax.random.split(k_loop)
            pools, kde, hat_eps = epoch_fn(k_ep, pools, hat_eps)
            hat_eps_hist.append(np.asarray(hat_eps))
            ep += 1
            packed = pack(pools)
            resident = resident_from_kde(kde, d_pad, kern.n_pad)
            pending_epoch = False
        take = min(seg_len, total - done)
        theta_k, y_k, logk_k, gatt, gacc, lacc, hist = kern_run(
            np.int32((seed + ep) % (2**31 - 1)), resident, *packed,
            theta_k, y_k, logk_k,
        )
        if collect_history:
            if on_segment is not None:
                block = np.moveaxis(np.asarray(hist)[:take, :d, :], 2, 0)
                on_segment(block, done)
                blocks.append(block)
            else:
                async_blocks.add(hist, take, done)
        frac = take / seg_len
        g_att = _acc_row(g_att, gatt, frac)
        g_acc = _acc_row(g_acc, gacc, frac)
        l_acc = _acc_row(l_acc, lacc, frac)
        steps_run += take
        done += take
        if take == seg_len:
            if done < total:
                pending_epoch = True
            if checkpoint_path is not None:
                save_epoch_ckpt(
                    checkpoint_path,
                    {"pools": pools, "kde": kde, "hat_eps": hat_eps,
                     "theta_k": theta_k, "y_k": y_k, "logk_k": logk_k,
                     "g_att": g_att, "g_acc": g_acc, "l_acc": l_acc,
                     "steps_run": steps_run, "ep": ep, "seed": seed,
                     "k_loop": k_loop,
                     "hat_eps_hist": (np.stack(hat_eps_hist)
                                      if hat_eps_hist
                                      else np.zeros((0,), np.float32))},
                    done, take, seg_len, meta=ckpt_meta)

    if collect_history and on_segment is None:
        blocks = async_blocks.blocks()
    head = [theta_init_row] if theta_init_row is not None else []
    if collect_history and (head or blocks):
        thetas = np.concatenate(head + blocks, axis=1)
    elif head:
        thetas = theta_init_row
    else:
        thetas = np.zeros((C, 0, d), np.float32)
    g_att_i = np.rint(np.asarray(g_att)).astype(np.int32)
    counts = MoveCounts(
        global_attempts=g_att_i,
        global_accepts=np.rint(np.asarray(g_acc)).astype(np.int32),
        local_attempts=(steps_run - g_att_i).astype(np.int32),
        local_accepts=np.rint(np.asarray(l_acc)).astype(np.int32),
    )
    return AGLResult(
        thetas=thetas, counts=counts,
        final_carry=_fused_final_carry(problem, d, theta_k,
                                       np.asarray(y_k)[:y_rows, :].T,
                                       logk_k[0],
                                       counts, key),
        kde=kde, hat_eps=np.asarray(hat_eps),
        hat_eps_hist=np.asarray(hat_eps_hist) if hat_eps_hist else None,
        fused_state=(theta_k, y_k, logk_k),
    )
