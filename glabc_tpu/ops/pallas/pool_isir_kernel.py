"""Pallas TPU kernel: fused pool-iSIR transition loop (AGLMCMC / pooled NF).

The adaptive samplers' global move is iSIR over a *precomputed* proposal
pool: candidates, their simulated datasets, and their MCMC log-weights are
all data computed at the preceding adaptation epoch
(reference ``AGLMCMC.py:124-164``).  At the canonical
``global_frequency = 1`` every transition is a global move, so the fused
per-step body needs **no problem-specific compute at all**:

* candidate ``j`` of step ``t`` carries a precomputed log-weight
  ``log pi + log K_eps - log q`` (pool slice ``t``, ``AGLMCMC.py:143-150``);
* the *current* state's log-weight is carried: after any accepted move the
  state IS a pool candidate whose log-weight was evaluated under the same
  epoch's proposal density, and the segment-entry value is computed on the
  XLA path (fresh KDE) once per epoch — exactly the value the scan path
  recomputes every step (``samplers/aglmcmc.py::_build_step``);
* the Gumbel-max categorical over the ``B+1`` log-weights
  (``glabc_tpu.ops.resampling``) runs as a streaming running-max.

The kernel therefore only *streams* pool slices from HBM — ``B`` candidate
thetas (``(B, d_pad)`` per chain) and their log-weights per step — while the
chain state (theta, carried log-weight, a selection index, and the move
counter) stays resident in VMEM across the whole segment via the revisited
output blocks of a ``(chain_blocks, steps)`` grid.  Selected candidates'
datasets and kernel values are *not* streamed: the kernel records the flat
pool slot of the last accepted candidate (``sel``) and the driver gathers
``y``/``log K_eps`` from the pool on the XLA path after the segment.

Streamed bytes per chain-transition: ``4 * (B * d_pad + 8)`` (= 192 B at the
canonical B=5, d<=8), so the HBM-bandwidth roofline is in the G-transitions/s
range; per-step compute is a handful of VPU selects.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mixture_kernel import _gumbel
from ._hashable import ConfigHashable
from .sharding import SEED_STRIDE

__all__ = ["PoolISIR", "pack_pool_theta", "pack_pool_logw"]

_SUB = 8  # float32 sublane tile


def pack_pool_theta(theta: jnp.ndarray, T: int, B: int, d_pad: int):
    """``(C, T*B, d)`` pool thetas -> kernel layout ``(T, B, d_pad, C)``."""
    C, P, d = theta.shape
    assert P == T * B
    x = theta.reshape(C, T, B, d)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad - d)))
    return jnp.transpose(x, (1, 2, 3, 0))


def pack_pool_logw(log_w: jnp.ndarray, T: int, B: int):
    """``(C, T*B)`` pool log-weights -> ``(T, 8, C)`` (rows >= B are -inf)."""
    C, P = log_w.shape
    assert P == T * B
    x = log_w.reshape(C, T, B)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, _SUB - B)),
                constant_values=-jnp.inf)
    return jnp.transpose(x, (1, 2, 0))


class PoolISIR(ConfigHashable):
    """Fused iSIR-over-pool transition kernel (problem-agnostic).

    One ``run`` call advances every chain ``steps_per_call`` transitions,
    consuming pool slice ``t`` at step ``t`` (the reference consumes one
    slice per *global* move, ``AGLMCMC.py:130``; at gf=1 the two coincide
    exactly).

    State layout: chains on lanes — ``theta (d_pad, C)``; carried log-weight,
    selection slot, and move counter ``(1, C)``.  Pool layout (see
    ``pack_pool_*``): ``pool_theta (T, B, d_pad, C)``,
    ``pool_logw (T, 8, C)`` — streamed one ``t``-block per grid step with
    Pallas's automatic double-buffering.
    """

    def __init__(self, theta_dim: int, *, batch_size: int = 5,
                 steps_per_call: int = 200, block_chains: int = 1024,
                 collect_history: bool = True, interpret: bool = False):
        self.d = int(theta_dim)
        self.d_pad = max(_SUB, ((self.d + _SUB - 1) // _SUB) * _SUB)
        self.B = int(batch_size)
        assert 1 <= self.B <= _SUB - 1, (
            "batch_size must be <= 7 (one 8-row Gumbel tile serves the "
            "B candidates plus the current state)")
        self.T = int(steps_per_call)
        self.C_blk = int(block_chains)
        assert self.C_blk % 128 == 0
        self.collect_history = bool(collect_history)
        self.interpret = bool(interpret)

    # ------------------------------------------------------------- kernel
    def _kernel(self, seed_ref, ptheta_ref, plogw_ref, theta_in_ref,
                logw_in_ref, theta_ref, logw_ref, sel_ref, moved_ref,
                hist_ref):
        B, C, T = self.B, self.C_blk, self.T
        i = pl.program_id(0)
        t = pl.program_id(1)
        # distinct stream per (chain-block, step) grid cell
        pltpu.prng_seed(seed_ref[0] + (i * T + t) * np.int32(SEED_STRIDE))

        @pl.when(t == 0)
        def _():
            theta_ref[:] = theta_in_ref[:]
            logw_ref[:] = logw_in_ref[:]
            sel_ref[:] = jnp.full((1, C), -1.0, jnp.float32)
            moved_ref[:] = jnp.zeros((1, C), jnp.float32)

        # one 8-row Gumbel tile: rows 0..B-1 for the candidates, row B for
        # the current state (Gumbel-max == categorical over B+1 log-weights)
        g = _gumbel((_SUB, C))
        best = logw_ref[:] + g[B:B + 1, :]
        b_theta = theta_ref[:]
        b_logw = logw_ref[:]
        b_sel = sel_ref[:]
        b_moved = jnp.zeros((1, C), jnp.float32)
        slot0 = (t * B).astype(jnp.float32)
        for j in range(B):
            score = plogw_ref[0, j:j + 1, :] + g[j:j + 1, :]
            upd = score > best
            best = jnp.where(upd, score, best)
            b_theta = jnp.where(upd, ptheta_ref[0, j], b_theta)
            b_logw = jnp.where(upd, plogw_ref[0, j:j + 1, :], b_logw)
            b_sel = jnp.where(upd, slot0 + np.float32(j), b_sel)
            b_moved = jnp.where(upd, 1.0, b_moved)

        theta_ref[:] = b_theta
        logw_ref[:] = b_logw
        sel_ref[:] = b_sel
        moved_ref[:] = moved_ref[:] + b_moved
        if self.collect_history:
            hist_ref[0] = b_theta

    # --------------------------------------------------------------- call
    @functools.partial(jax.jit, static_argnums=(0,))
    def run(self, seed, pool_theta, pool_logw, theta, logw):
        """Run ``steps_per_call`` fused pool-iSIR transitions.

        Args: ``seed`` int32 scalar; ``pool_theta (T, B, d_pad, C)``;
        ``pool_logw (T, 8, C)``; ``theta (d_pad, C)``; ``logw (1, C)``.
        Returns ``(theta, logw, sel, moved, history|None)`` where ``sel``
        ``(1, C)`` is the flat pool slot (``t*B + j``) of the last accepted
        candidate (-1 if the chain never moved) and ``moved`` ``(1, C)``
        counts accepted moves.
        """
        C = theta.shape[-1]
        assert C % self.C_blk == 0
        n_blk = C // self.C_blk
        dp, T, B = self.d_pad, self.T, self.B

        grid = (n_blk, T)
        state_spec = pl.BlockSpec((dp, self.C_blk), lambda i, t: (0, i),
                                  memory_space=pltpu.VMEM)
        row_spec = pl.BlockSpec((1, self.C_blk), lambda i, t: (0, i),
                                memory_space=pltpu.VMEM)
        ptheta_spec = pl.BlockSpec((1, B, dp, self.C_blk),
                                   lambda i, t: (t, 0, 0, i),
                                   memory_space=pltpu.VMEM)
        plogw_spec = pl.BlockSpec((1, _SUB, self.C_blk),
                                  lambda i, t: (t, 0, i),
                                  memory_space=pltpu.VMEM)
        if self.collect_history:
            hist_spec = pl.BlockSpec((1, dp, self.C_blk),
                                     lambda i, t: (t, 0, i),
                                     memory_space=pltpu.VMEM)
            hist_shape = jax.ShapeDtypeStruct((T, dp, C), jnp.float32)
        else:
            hist_spec = pl.BlockSpec((1, dp, self.C_blk),
                                     lambda i, t: (0, 0, i),
                                     memory_space=pltpu.VMEM)
            hist_shape = jax.ShapeDtypeStruct((1, dp, C), jnp.float32)

        out = pl.pallas_call(
            self._kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                ptheta_spec, plogw_spec, state_spec, row_spec,
            ],
            out_specs=(state_spec, row_spec, row_spec, row_spec, hist_spec),
            out_shape=(
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                hist_shape,
            ),
            interpret=pltpu.InterpretParams() if self.interpret else False,
        )(jnp.asarray([seed], jnp.int32), pool_theta, pool_logw, theta, logw)
        theta_n, logw_n, sel, moved, hist = out
        return (theta_n, logw_n, sel, moved,
                hist if self.collect_history else None)

    # ---------------------------------------------------------- multi-chip
    def make_sharded_run(self, mesh):
        """Multi-chip variant of :meth:`run`: the chain (lane) axis of the
        state AND the per-chain pools is sharded over a 1-D mesh and the
        per-device ``pallas_call`` runs inside ``shard_map`` with zero
        collectives (pool-iSIR is chain-elementwise).  Each device's PRNG
        seed is offset by ``device_index * local_blocks * T`` grid slots so
        the device streams tile the exact ``seed + (i*T + t) * stride``
        pattern of one big single-device grid.

        Returns ``run(seed, pool_theta, pool_logw, theta, logw)`` taking
        globally-sharded arrays (state rows ``P(None, 'chains')``, pools
        ``P(None, ..., 'chains')``)."""
        from jax.sharding import PartitionSpec as P

        from ...parallel.mesh import CHAIN_AXIS

        T, C_blk = self.T, self.C_blk

        def worker(seed, ptheta, plogw, theta, logw):
            my = jax.lax.axis_index(CHAIN_AXIS)
            n_blk_local = theta.shape[-1] // C_blk
            seed_dev = (seed
                        + my.astype(jnp.int32)
                        * jnp.int32(n_blk_local * T)
                        * jnp.int32(SEED_STRIDE))
            return self.run(seed_dev, ptheta, plogw, theta, logw)

        row = P(None, CHAIN_AXIS)
        out_specs = (row, row, row, row,
                     (P(None, None, CHAIN_AXIS) if self.collect_history
                      else None))
        sharded = jax.shard_map(
            worker, mesh=mesh,
            in_specs=(P(), P(None, None, None, CHAIN_AXIS),
                      P(None, None, CHAIN_AXIS), row, row),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(sharded)
