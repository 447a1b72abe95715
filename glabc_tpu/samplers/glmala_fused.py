"""High-level driver for the fused Pallas GLMALA kernel.

Wraps :class:`glabc_tpu.ops.pallas.glmala_kernel.PackedMixtureGLMALA` in the
same result type as the scan-path samplers, for Mixture-family problems
(Gaussian prior/proposals, ``y = |theta| + sigma z`` simulator, ``d | 8``).
Use this when the problem fits the fused family and GLMALA throughput
matters — the gradient batch (``2 * d * num_grad`` sims per local move,
reference ``GLMALA.py:46-95``) runs entirely in VMEM; use ``run_glmala``
(XLA-fused scan, arbitrary problems) otherwise.
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.pallas.glmala_kernel import PackedMixtureGLMALA, packed_grad_init
from ..ops.pallas.packed_kernel import packed_state_init, unpack_history
from ._fused_io import restore_fused_ckpt, save_fused_ckpt
from .base import MoveCounts, SamplerResult

__all__ = ["run_glmala_fused"]

_SUB = 8


def _unpack_stats(x, pack: int, d: int):
    """(8, C) leader-row counters -> (pack*C,) per-chain counts, in
    ``unpack_history`` chain order."""
    C = x.shape[-1]
    return np.asarray(x).reshape(pack, d, C)[:, 0, :].reshape(pack * C)


def run_glmala_fused(problem, key, num_ite, theta0, *, y0=None, ip_loc=0.0,
                     ip_scale=1.0, prior_loc=0.0, prior_scale=1.0,
                     global_frequency=0.8, batch_size=5, tau=0.3,
                     num_grad=100, fd_step=0.1, num_chains: int = 2048,
                     steps_per_call: int = 32, block_chains: int = 512,
                     collect_history: bool = True, coin_mode: str = "shared",
                     on_segment=None, seed: int | None = None,
                     mesh=None, interpret: bool = False,
                     checkpoint_path: str | None = None,
                     resume: bool = False) -> SamplerResult:
    """GLMALA via the fused Pallas kernel.  Returns a
    :class:`SamplerResult` with chains ``(num_chains, num_ite, d)`` (initial
    state at index 0), matching the scan path's conventions.

    ``num_chains`` must be a multiple of ``pack * block_chains`` where
    ``pack = 8 // theta_dim``.  ``coin_mode='shared'`` (default) uses one
    global/local coin per step across all chains so global steps skip the
    gradient batch entirely; ``'per_chain'`` gives exact reference coin
    semantics at the cost of computing the gradient every step.

    Ragged ``num_ite``: like ``run_glmcmc_fused``, the kernel always runs
    ``steps_per_call`` transitions per launch; a final partial segment keeps
    history exact but scales its move counters pro-rata.

    ``mesh``: a 1-D :class:`jax.sharding.Mesh` shards the chain (lane) axis
    over devices and runs the kernel per-device inside ``shard_map``
    (chain-elementwise, zero collectives; the shared per-step coins are
    replicated so global/local step choice stays coherent across devices).
    Requires ``num_chains`` divisible by ``pack * block_chains * mesh size``.
    """
    d = problem.theta_dim
    sigma = getattr(problem, "_noise_std", None)
    if sigma is None:
        raise ValueError(
            "run_glmala_fused supports Mixture-family problems "
            "(with a Gaussian simulator noise scale); use run_glmala for "
            "arbitrary problems"
        )
    pack = _SUB // d
    assert num_chains % pack == 0, f"num_chains must be a multiple of {pack}"
    num_cols = num_chains // pack
    assert num_cols % block_chains == 0, (
        f"num_chains/{pack} must be a multiple of block_chains")

    kern = PackedMixtureGLMALA(
        d, problem.y_obs, epsilon=problem.epsilon, sigma=sigma,
        global_frequency=global_frequency, batch_size=batch_size, tau=tau,
        num_grad=num_grad, fd_step=fd_step, prior_loc=prior_loc,
        prior_scale=prior_scale, ip_loc=ip_loc, ip_scale=ip_scale,
        steps_per_call=steps_per_call, block_chains=block_chains,
        collect_history=collect_history, coin_mode=coin_mode,
        interpret=interpret,
    )
    # restore BEFORE state init so a resume skips the initial simulations
    # and the num_grad-replicate gradient batch entirely
    ckpt_meta = {"kernel": "glmala_packed", "num_chains": num_chains,
                 "theta_dim": d, "steps_per_call": steps_per_call,
                 "block_chains": block_chains, "num_grad": num_grad}
    restored = (restore_fused_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is None:
        theta, y, logk = packed_state_init(problem, key, theta0, num_cols,
                                           pack, y0=y0)
        grad = packed_grad_init(problem, key, theta0, num_cols, pack,
                                num_grad, fd_step)
        theta0_arr = unpack_history(np.asarray(theta)[None], d)  # (C, 1, d)
    else:
        (theta, y, logk, grad) = restored[0]
        theta0_arr = None

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import CHAIN_AXIS
        n_dev = mesh.devices.size
        assert num_cols % (block_chains * n_dev) == 0, (
            f"num_chains must divide by {pack * block_chains * n_dev}")
        sh = NamedSharding(mesh, P(None, CHAIN_AXIS))
        theta, y, logk, grad = (jax.device_put(x, sh)
                                for x in (theta, y, logk, grad))
        run_fn = kern.make_sharded_run(mesh)
    else:
        run_fn = kern.run

    if seed is None:
        seed = int(jax.random.randint(jax.random.fold_in(key, 7), (),
                                      0, 2**31 - 1))

    total = num_ite - 1
    if restored is not None:
        (_, (g_att, g_acc, l_acc), steps_run, call_idx, seed,
         done) = restored
    else:
        g_att = np.zeros((num_chains,), np.float64)
        g_acc = np.zeros((num_chains,), np.float64)
        l_acc = np.zeros((num_chains,), np.float64)
        steps_run = 0
        done = 0
        call_idx = 0
    coin_rng = np.random.default_rng(seed)
    for _ in range(call_idx):  # replay the host coin stream on resume
        coin_rng.random(kern.T)
    blocks = [theta0_arr] if (collect_history and done == 0) else []
    while done < total:
        call_idx += 1
        coins = (coin_rng.random(kern.T) < global_frequency).astype(np.int32)
        theta, y, logk, grad, hist, stats = run_fn(
            np.int32((seed + call_idx) % (2**31 - 1)), coins, theta, y,
            logk, grad,
        )
        take = min(kern.T, total - done)
        if collect_history:
            block = unpack_history(np.asarray(hist)[:take], d)  # (C, take, d)
            if on_segment is not None:
                on_segment(block, done)
            blocks.append(block)
        frac = take / kern.T
        g_att += _unpack_stats(stats.global_attempts, pack, d) * frac
        g_acc += _unpack_stats(stats.global_accepts, pack, d) * frac
        l_acc += _unpack_stats(stats.local_accepts, pack, d) * frac
        steps_run += take
        done += take
        if checkpoint_path is not None:
            save_fused_ckpt(checkpoint_path, (theta, y, logk, grad),
                            (g_att, g_acc, l_acc), steps_run, call_idx,
                            seed, done, take, kern.T, meta=ckpt_meta)

    thetas = (np.concatenate(blocks, axis=1)
              if collect_history and blocks
              else unpack_history(np.asarray(theta)[None], d))
    g_att_i = np.rint(g_att).astype(np.int32)
    counts = MoveCounts(
        global_attempts=g_att_i,
        global_accepts=np.rint(g_acc).astype(np.int32),
        local_attempts=(steps_run - g_att_i).astype(np.int32),
        local_accepts=np.rint(l_acc).astype(np.int32),
    )
    return SamplerResult(thetas=thetas, counts=counts,
                         final_carry=(theta, y, logk, grad))
