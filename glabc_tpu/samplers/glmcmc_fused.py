"""High-level driver for the fused Pallas GLMCMC kernel.

Wraps :class:`glabc_tpu.ops.pallas.mixture_kernel.FusedMixtureGLMCMC` in the
same result type as the scan-path samplers, for Mixture-family problems
(Gaussian prior/proposals, ``y = |theta| + sigma z`` simulator).  Use this
when the problem fits the fused family and throughput matters; use
``run_glmcmc`` (XLA-fused scan, arbitrary problems) otherwise.
"""

from __future__ import annotations

import jax
import numpy as np

from ..ops.pallas.mixture_kernel import FusedMixtureGLMCMC, fused_state_init
from ..ops.pallas.packed_kernel import (
    PackedMixtureGLMCMC,
    packed_state_init,
    unpack_history,
)
from ._fused_io import restore_fused_ckpt, save_fused_ckpt
from .base import MoveCounts, SamplerResult

__all__ = ["run_glmcmc_fused", "run_global_mcmc_fused"]

_SUB = 8


def run_glmcmc_fused(problem, key, num_ite, theta0, *, y0=None, ip_loc=0.0,
                     ip_scale=1.0, lp_scale=0.35, prior_loc=0.0,
                     prior_scale=1.0, global_frequency=0.9, batch_size=5,
                     num_chains: int = 1024, steps_per_call: int = 256,
                     block_chains: int = 512, collect_history: bool = True,
                     on_segment=None, seed: int | None = None,
                     kernel: str = "auto", mesh=None,
                     algorithm: str = "glmcmc",
                     checkpoint_path: str | None = None,
                     resume: bool = False) -> SamplerResult:
    """GLMCMC via the fused Pallas kernel.  Returns a
    :class:`SamplerResult` with chains of length ``num_ite`` (initial state
    at index 0), matching the scan path's conventions.

    ``kernel``: ``'packed'`` (sublane chain packing, ~2x the throughput,
    needs ``theta_dim | 8`` and ``num_chains`` a multiple of
    ``(8/d) * block_chains``), ``'unpacked'``, or ``'auto'`` (packed when
    the constraints hold).

    ``algorithm``: ``'glmcmc'`` (iSIR global move) or ``'global'``
    (independence-MH global move — the GlobalMCMC sampler; prefer the
    :func:`run_global_mcmc_fused` wrapper, which names the proposal
    arguments accordingly).

    ``mesh``: a 1-D :class:`jax.sharding.Mesh` shards the chain (lane)
    axis over devices and runs the packed kernel per-device inside
    ``shard_map`` (chain-elementwise, zero collectives; per-device PRNG
    streams tile the single-grid pattern).  Requires the packed kernel and
    ``num_chains`` divisible by ``pack * block_chains * mesh size``.

    ``checkpoint_path``/``resume``: scan-path semantics
    (:func:`sample_with_step`) — the full loop state (packed tiles, move
    counters, PRNG seed, call index) is snapshotted after every aligned
    kernel launch (ragged final segments are not checkpointed: the carry
    would be ahead of the recorded history — a resume replays them
    bitwise from the last aligned point instead); ``resume=True``
    continues where the run stopped, and the resumed result contains only
    the remaining transitions but cumulative whole-run move counts.

    Note: the kernel always runs ``steps_per_call`` transitions per launch;
    if ``num_ite - 1`` is not a multiple of it, the recorded history is
    still gap-free and exactly ``num_ite`` long, but the final carry is up
    to ``steps_per_call - 1`` (unrecorded) transitions ahead of the last
    recorded state, and the move counters for the ragged call are scaled
    pro-rata.  Use a multiple of ``steps_per_call`` for exact accounting."""
    d = problem.theta_dim
    sigma = getattr(problem, "_noise_std", None)
    if sigma is None:
        raise ValueError(
            "run_glmcmc_fused supports Mixture-family problems "
            "(with a Gaussian simulator noise scale); use run_glmcmc for "
            "arbitrary problems"
        )
    pack = _SUB // d if _SUB % d == 0 else 0
    if kernel == "auto":
        kernel = ("packed" if pack and num_chains % (pack * block_chains) == 0
                  else "unpacked")

    # restore BEFORE state init so a resume skips the per-chain initial
    # simulations entirely
    ckpt_meta = {"kernel": kernel, "algorithm": algorithm,
                 "num_chains": num_chains, "theta_dim": d,
                 "steps_per_call": steps_per_call,
                 "block_chains": block_chains}
    restored = (restore_fused_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)

    if kernel == "packed":
        assert pack, f"packed kernel needs theta_dim | 8, got {d}"
        assert num_chains % (pack * block_chains) == 0, (
            f"num_chains must be a multiple of {pack * block_chains}")
        num_cols = num_chains // pack
        kern = PackedMixtureGLMCMC(
            d, problem.y_obs, epsilon=problem.epsilon, sigma=sigma,
            global_frequency=global_frequency, batch_size=batch_size,
            prior_loc=prior_loc, prior_scale=prior_scale, ip_loc=ip_loc,
            ip_scale=ip_scale, lp_scale=lp_scale,
            steps_per_call=steps_per_call, block_chains=block_chains,
            collect_history=collect_history, algorithm=algorithm,
        )
        if restored is None:
            theta, y, logk = packed_state_init(problem, key, theta0,
                                               num_cols, pack, y0=y0)
            theta0_arr = unpack_history(np.asarray(theta)[None], d)
        else:
            (theta, y, logk) = restored[0]
            theta0_arr = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import CHAIN_AXIS
            n_dev = mesh.devices.size
            assert num_cols % (block_chains * n_dev) == 0, (
                f"num_chains must divide by {pack * block_chains * n_dev}")
            sh = NamedSharding(mesh, P(None, CHAIN_AXIS))
            theta, y, logk = (jax.device_put(x, sh)
                              for x in (theta, y, logk))
            run_fn = kern.make_sharded_run(mesh)
        else:
            run_fn = kern.run

        def stats_row(x):  # (8, C) leader-row counters -> (pack*C,)
            return (np.asarray(x).reshape(pack, d, num_cols)[:, 0, :]
                    .reshape(num_chains))

        def hist_block(hist, take):
            return unpack_history(np.asarray(hist)[:take], d)
    else:
        assert mesh is None, "mesh= requires the packed kernel"
        kern = FusedMixtureGLMCMC(
            d, problem.y_obs, epsilon=problem.epsilon, sigma=sigma,
            global_frequency=global_frequency, batch_size=batch_size,
            prior_loc=prior_loc, prior_scale=prior_scale, ip_loc=ip_loc,
            ip_scale=ip_scale, lp_scale=lp_scale,
            steps_per_call=steps_per_call, block_chains=block_chains,
            collect_history=collect_history, algorithm=algorithm,
        )
        if restored is None:
            theta, y, logk = fused_state_init(problem, key, theta0,
                                              num_chains, kern.d_pad, y0=y0)
            theta0_arr = np.asarray(theta)[:d, :].T[:, None, :]  # (C, 1, d)
        else:
            (theta, y, logk) = restored[0]
            theta0_arr = None
        run_fn = kern.run

        def stats_row(x):
            return np.asarray(x)[0]

        def hist_block(hist, take):
            block = np.asarray(hist)[:take, :d, :]      # (take, d, C)
            return np.moveaxis(block, 2, 0)             # (C, take, d)

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
    blocks = [theta0_arr] if (collect_history and done == 0) else []
    while done < total:
        call_idx += 1
        theta, y, logk, hist, stats = run_fn(
            np.int32((seed + call_idx) % (2**31 - 1)), theta, y, logk
        )
        take = min(kern.T, total - done)
        if collect_history:
            block = hist_block(hist, take)
            if on_segment is not None:
                on_segment(block, done)
            blocks.append(block)
        # the kernel always runs T steps; scale the final partial segment
        frac = take / kern.T
        g_att += stats_row(stats.global_attempts) * frac
        g_acc += stats_row(stats.global_accepts) * frac
        l_acc += stats_row(stats.local_accepts) * frac
        steps_run += take
        done += take
        if checkpoint_path is not None:
            save_fused_ckpt(checkpoint_path, (theta, y, logk),
                            (g_att, g_acc, l_acc), steps_run, call_idx,
                            seed, done, take, kern.T, meta=ckpt_meta)

    if collect_history and blocks:
        thetas = np.concatenate(blocks, axis=1)
    elif kernel == "packed":
        thetas = unpack_history(np.asarray(theta)[None], d)
    else:
        thetas = np.asarray(theta)[:d, :].T[:, None, :]
    g_att_i = np.rint(g_att).astype(np.int32)
    counts = MoveCounts(
        global_attempts=g_att_i,
        global_accepts=np.rint(g_acc).astype(np.int32),
        local_attempts=(steps_run - g_att_i).astype(np.int32),
        local_accepts=np.rint(l_acc).astype(np.int32),
    )
    return SamplerResult(thetas=thetas, counts=counts,
                         final_carry=(theta, y, logk))


def run_global_mcmc_fused(problem, key, num_ite, theta0, *, gp_loc=0.0,
                          gp_scale=1.0, lp_scale=0.35, **kwargs
                          ) -> SamplerResult:
    """GlobalMCMC (independence-MH global + RW local, reference
    ``GlobalMCMC.py:6-98``) via the fused Pallas kernels.

    Thin wrapper over :func:`run_glmcmc_fused` with
    ``algorithm='global'`` — the parametric global proposal
    ``N(gp_loc, gp_scale^2 I)`` takes the importance-proposal slot and the
    iSIR ``batch_size`` is ignored.  Accepts the same ``kernel``/``mesh``/
    segmentation kwargs."""
    return run_glmcmc_fused(problem, key, num_ite, theta0, ip_loc=gp_loc,
                            ip_scale=gp_scale, lp_scale=lp_scale,
                            algorithm="global", **kwargs)
