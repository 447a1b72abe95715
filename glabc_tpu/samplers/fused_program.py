"""Driver for the generic fused Pallas kernel (:mod:`generic_kernel`).

``run_fused_program`` runs any :class:`TileProgram` — an arbitrary user
problem lowered to tile callables — through the same fused transition loop,
segmentation, history collection, and ``SamplerResult`` contract as the
Mixture-specialized drivers (``run_glmcmc_fused``).  The reference has no
counterpart (its hot loop is the sequential Python body at
``GLMCMC.py:58-104``); this is the mechanism that extends the framework's
speed-of-light path beyond the built-in problem families.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.generic_kernel import GenericFusedGLMCMC, TileProgram
from ._fused_io import restore_fused_ckpt, save_fused_ckpt
from .base import MoveCounts, SamplerResult

__all__ = ["run_fused_program", "run_glmala_program", "program_state_init"]

_SUB = 8


def program_state_init(problem, key, theta0, num_chains: int, d_pad: int,
                       y_rows: int, y0=None):
    """Initial ``(d_pad, C)`` theta/y tiles + ``(1, C)`` log-kernel, from
    the host-side problem (one simulation per chain, like the scan path).

    ``y0``: optional initial dataset (reference ``initial_y``), broadcast
    or per-chain; ``None`` simulates per chain from theta0."""
    d = problem.theta_dim
    theta0 = jnp.asarray(theta0, jnp.float32).reshape(-1)
    theta = jnp.zeros((d_pad, num_chains), jnp.float32)
    theta = theta.at[:d, :].set(theta0[:, None])
    if y0 is None:
        y0 = jax.vmap(problem.simulate)(
            jax.random.split(jax.random.fold_in(key, 1), num_chains),
            jnp.broadcast_to(theta0, (num_chains, d)),
        )  # (C, y_rows)
    else:
        y0 = jnp.asarray(y0, jnp.float32).reshape(-1, y_rows)
        if y0.shape[0] == 1:
            y0 = jnp.broadcast_to(y0, (num_chains, y_rows))
        assert y0.shape[0] == num_chains
    y0 = jnp.asarray(y0, jnp.float32)
    y = jnp.zeros((d_pad, num_chains), jnp.float32)
    y = y.at[:y_rows, :].set(y0.T)
    logk = problem.kernel_log_prob(problem.discrepancy(y0))[None, :]
    return theta, y, logk


def run_fused_program(problem, program: TileProgram, key, num_ite, theta0,
                      *, y0=None, global_frequency=0.9, batch_size=5,
                      num_chains: int = 1024, steps_per_call: int = 256,
                      block_chains: int = 512, collect_history: bool = True,
                      on_segment=None, seed: int | None = None,
                      algorithm: str = "glmcmc", mesh=None,
                      interpret: bool = False,
                      checkpoint_path: str | None = None,
                      resume: bool = False) -> SamplerResult:
    """GLMCMC (``algorithm='glmcmc'``) or GlobalMCMC (``'global'``) on an
    arbitrary :class:`TileProgram` via the generic fused Pallas kernel.

    ``problem`` supplies the host-side pieces (initial simulation +
    kernel log-prob); ``program`` is its tile-level lowering (e.g.
    ``problem.tile_program()``).  Segmentation/ragged-``num_ite`` semantics
    match :func:`run_glmcmc_fused`; ``mesh`` shards the chain axis via
    ``shard_map`` as in the packed drivers.
    """
    d = program.theta_dim
    assert d == problem.theta_dim
    assert num_chains % block_chains == 0

    kern = GenericFusedGLMCMC(
        program, global_frequency=global_frequency, batch_size=batch_size,
        steps_per_call=steps_per_call, block_chains=block_chains,
        collect_history=collect_history, interpret=interpret,
        algorithm=algorithm,
    )
    # restore BEFORE state init so a resume skips the initial simulations
    ckpt_meta = {"kernel": "generic_program", "algorithm": algorithm,
                 "num_chains": num_chains, "theta_dim": d,
                 "steps_per_call": steps_per_call,
                 "block_chains": block_chains}
    restored = (restore_fused_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is None:
        theta, y, logk = program_state_init(problem, key, theta0,
                                            num_chains, kern.d_pad,
                                            program.y_rows, y0=y0)
        theta0_arr = np.asarray(theta)[:d, :].T[:, None, :]  # (C, 1, d)
    else:
        (theta, y, logk) = restored[0]
        theta0_arr = None

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import CHAIN_AXIS
        n_dev = mesh.devices.size
        assert num_chains % (block_chains * n_dev) == 0
        sh = NamedSharding(mesh, P(None, CHAIN_AXIS))
        theta, y = (jax.device_put(x, sh) for x in (theta, y))
        logk = jax.device_put(logk, sh)
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
    blocks = [theta0_arr] if (collect_history and done == 0) else []
    while done < total:
        call_idx += 1
        theta, y, logk, hist, stats = run_fn(
            np.int32((seed + call_idx) % (2**31 - 1)), theta, y, logk
        )
        take = min(kern.T, total - done)
        if collect_history:
            block = np.asarray(hist)[:take, :d, :]      # (take, d, C)
            block = np.moveaxis(block, 2, 0)            # (C, take, d)
            if on_segment is not None:
                on_segment(block, done)
            blocks.append(block)
        frac = take / kern.T
        g_att += np.asarray(stats.global_attempts)[0] * frac
        g_acc += np.asarray(stats.global_accepts)[0] * frac
        l_acc += np.asarray(stats.local_accepts)[0] * frac
        steps_run += take
        done += take
        if checkpoint_path is not None:
            save_fused_ckpt(checkpoint_path, (theta, y, logk),
                            (g_att, g_acc, l_acc), steps_run, call_idx,
                            seed, done, take, kern.T, meta=ckpt_meta)

    thetas = (np.concatenate(blocks, axis=1)
              if collect_history and blocks
              else np.asarray(theta)[:d, :].T[:, None, :])
    g_att_i = np.rint(g_att).astype(np.int32)
    counts = MoveCounts(
        global_attempts=g_att_i,
        global_accepts=np.rint(g_acc).astype(np.int32),
        local_attempts=(steps_run - g_att_i).astype(np.int32),
        local_accepts=np.rint(l_acc).astype(np.int32),
    )
    return SamplerResult(thetas=thetas, counts=counts,
                         final_carry=(theta, y, logk))


def run_glmala_program(problem, program: TileProgram, key, num_ite, theta0,
                       *, y0=None, global_frequency=0.8, batch_size=5,
                       tau=0.3, num_grad: int = 100, fd_step: float = 0.1,
                       num_chains: int = 1024, steps_per_call: int = 16,
                       block_chains: int = 512,
                       collect_history: bool = True, on_segment=None,
                       seed: int | None = None, coin_mode: str = "shared",
                       mesh=None, interpret: bool = False,
                       checkpoint_path: str | None = None,
                       resume: bool = False) -> SamplerResult:
    """GLMALA on an arbitrary :class:`TileProgram` via the generic fused
    kernel (:class:`~glabc_tpu.ops.pallas.generic_glmala_kernel.GenericFusedGLMALA`)
    — the reference's problem-agnostic CRN synthetic-likelihood gradient
    (``GLMALA.py:46-95``) running the program's simulator in-VMEM.  The
    program must define ``discrepancy`` and ``prior_grad``.

    Same call/segmentation contract as :func:`run_fused_program`;
    ``coin_mode`` as in :func:`glabc_tpu.samplers.glmala_fused.run_glmala_fused`
    ('shared' skips the gradient batch on global steps)."""
    from ..ops.pallas.generic_glmala_kernel import GenericFusedGLMALA
    from .glmala import synthetic_likelihood_grad

    d = program.theta_dim
    assert d == problem.theta_dim
    assert num_chains % block_chains == 0

    kern = GenericFusedGLMALA(
        program, epsilon=float(problem.epsilon),
        global_frequency=global_frequency, batch_size=batch_size, tau=tau,
        num_grad=num_grad, fd_step=fd_step, steps_per_call=steps_per_call,
        block_chains=block_chains, collect_history=collect_history,
        coin_mode=coin_mode, interpret=interpret,
    )
    ckpt_meta = {"kernel": "generic_glmala", "num_chains": num_chains,
                 "theta_dim": d, "steps_per_call": steps_per_call,
                 "block_chains": block_chains, "num_grad": num_grad}
    restored = (restore_fused_ckpt(checkpoint_path, ckpt_meta)
                if resume and checkpoint_path is not None else None)
    if restored is None:
        theta, y, logk = program_state_init(problem, key, theta0,
                                            num_chains, kern.d_pad,
                                            program.y_rows, y0=y0)
        th0 = jnp.asarray(theta0, jnp.float32).reshape(-1)
        gkeys = jax.random.split(jax.random.fold_in(key, 2), num_chains)
        vgrad = jax.vmap(lambda k: synthetic_likelihood_grad(
            problem, k, th0, num_grad, fd_step))
        gchunk = 4096  # the 2*d*num_grad replicate batch OOMs vmapped
        if num_chains > gchunk and num_chains % gchunk == 0:
            grads = jax.lax.map(
                vgrad, gkeys.reshape(num_chains // gchunk, gchunk,
                                     *gkeys.shape[1:]))
            grads = grads.reshape(num_chains, -1)
        else:
            grads = vgrad(gkeys)                              # (C, d)
        grad = jnp.zeros((kern.d_pad, num_chains), jnp.float32)
        grad = grad.at[:d, :].set(grads.T)
        theta0_arr = np.asarray(theta)[:d, :].T[:, None, :]
    else:
        (theta, y, logk, grad) = restored[0]
        theta0_arr = None

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import CHAIN_AXIS
        n_dev = mesh.devices.size
        assert num_chains % (block_chains * n_dev) == 0
        sh = NamedSharding(mesh, P(None, CHAIN_AXIS))
        theta, y, grad = (jax.device_put(x, sh) for x in (theta, y, grad))
        logk = jax.device_put(logk, sh)
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
        coins = (coin_rng.random(kern.T)
                 < global_frequency).astype(np.int32)
        theta, y, logk, grad, hist, stats = run_fn(
            np.int32((seed + call_idx) % (2**31 - 1)), coins, theta, y,
            logk, grad,
        )
        take = min(kern.T, total - done)
        if collect_history:
            block = np.moveaxis(np.asarray(hist)[:take, :d, :], 2, 0)
            if on_segment is not None:
                on_segment(block, done)
            blocks.append(block)
        frac = take / kern.T
        g_att += np.asarray(stats.global_attempts)[0] * frac
        g_acc += np.asarray(stats.global_accepts)[0] * frac
        l_acc += np.asarray(stats.local_accepts)[0] * frac
        steps_run += take
        done += take
        if checkpoint_path is not None:
            save_fused_ckpt(checkpoint_path, (theta, y, logk, grad),
                            (g_att, g_acc, l_acc), steps_run, call_idx,
                            seed, done, take, kern.T, meta=ckpt_meta)

    thetas = (np.concatenate(blocks, axis=1)
              if collect_history and blocks
              else np.asarray(theta)[:d, :].T[:, None, :])
    g_att_i = np.rint(g_att).astype(np.int32)
    counts = MoveCounts(
        global_attempts=g_att_i,
        global_accepts=np.rint(g_acc).astype(np.int32),
        local_attempts=(steps_run - g_att_i).astype(np.int32),
        local_accepts=np.rint(l_acc).astype(np.int32),
    )
    return SamplerResult(thetas=thetas, counts=counts,
                         final_carry=(theta, y, logk, grad))
