"""Pallas TPU kernel: fused pool-iSIR + local-RW transition loop (AGLMCMC
at ``global_frequency < 1``, Mixture-family problems).

Extends :class:`~glabc_tpu.ops.pallas.pool_isir_kernel.PoolISIR` (the gf=1
kernel) to the reference's full coin-mixture transition
(``AGLMCMC.py:124-289``): per step, a per-chain Bernoulli(gf) coin picks

* **global**: iSIR over a precomputed pool slice.  Unlike the gf=1 kernel,
  the current state may have arrived by a *local* move, so its iSIR
  log-weight cannot be carried — the reference recomputes
  ``KDE.log_prob(theta_old)`` at every global move (``AGLMCMC.py:137-141``).
  The kernel therefore evaluates the adapted proposal density **in-kernel**
  against a VMEM-resident Gaussian-mixture representation of the epoch's
  shared KDE (support points x bandwidth), as an MXU matmul
  ``(n, d) @ (d, C)`` plus a chunked streaming logsumexp — the same
  ``|x|^2 - 2 x.mu + |mu|^2`` decomposition as
  :meth:`glabc_tpu.models.kde.KernelDensity.log_prob`, with the reference's
  ``log(w + 1e-10)`` stabilizer folded into the per-component constant;
* **local**: the Mixture-family random-walk MH move fused in VMEM —
  propose ``theta + lp_scale * z``, simulate ``y = |theta| + sigma * z'``,
  Gaussian epsilon-kernel accept — identical to the local branch of
  :class:`~glabc_tpu.ops.pallas.mixture_kernel.FusedMixtureGLMCMC`.

A VMEM-resident proposal requires the KDE support to be *shared across
chains*, so this kernel serves the ``shared_adaptation=True`` mode (the
scaled cross-chain adaptation; per-chain-KDE gf<1 stays on the scan path,
whose per-chain supports cannot fit on-chip).

**Pool cadence** (slice-per-step): pool slice ``t`` belongs to step ``t``
and is consumed only if that step's coin is global — unconsumed slices are
simply skipped.  Because every slice is an iid draw from the same epoch
proposal, a skipped slice is statistically indistinguishable from the
reference's sequential-cursor consumption (``AGLMCMC.py:130``), and the
adaptation epoch trains on the FULL pool regardless of consumption, in the
reference's manner (``AGLMCMC.py:199-204`` reweights ``Theta_prop0``
entirely) — so no slack accounting is needed at all; segments are
``seg_len = round(step_size / gf)`` steps with ``seg_len`` pool slices.
Note the training pool is therefore ``seg_len * B = (1/gf) * step_size * B``
rows — 1/gf times the reference's ``step_size * B`` training set, a
deliberate (variance-reducing) divergence documented in PARITY.md.
The epoch-timing jitter vs the reference's consumed-slice trigger is the
divergence class bounded by ``tests/test_aglmcmc_cadence.py``.

Streamed bytes per chain-transition: ``4 * (2 B d_pad + 16)`` (the
candidate thetas AND their datasets — carrying ``y`` in VMEM removes the
gf=1 kernel's post-hoc ``sel`` gather, which cannot express local moves).
Per-step compute is dominated by the resident-KDE logsumexp:
``n_support`` exps per chain per step on the VPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mixture_kernel import _gumbel, _normal_pair, _uniform
from ._hashable import ConfigHashable
from .sharding import SEED_STRIDE

__all__ = ["PoolISIRMixed", "ResidentProposal", "resident_from_gaussian",
           "resident_from_kde"]

_SUB = 8  # float32 sublane tile
_LOG_2PI = float(np.log(2.0 * np.pi))
_NEG = -1.0e30  # pad-row sentinel (finite: -inf breaks the running max)


class ResidentProposal(NamedTuple):
    """VMEM-resident Gaussian-mixture proposal density.

    ``log q(theta) = logsumexp_i(pre_i + mu_scaled_i . theta)
    - 0.5 * sum_k theta_k^2 * inv2h_k`` where ``mu_scaled = mu / h^2`` and
    ``pre_i = log(w_i + 1e-10) - 0.5 sum_k mu_ik^2/h_k^2 - sum_k log h_k
    - (d/2) log 2pi`` (padding rows carry ``pre = -1e30``).
    """

    mu_scaled: jnp.ndarray  # (n_pad, d_pad)
    pre: jnp.ndarray        # (n_pad, 1)
    inv2h: jnp.ndarray      # (d_pad, 1) — 1/h_k^2, 0 in padded dims


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _build_resident(mu, h, log_w, d_pad: int, n_pad: int) -> ResidentProposal:
    mu = jnp.asarray(mu, jnp.float32)          # (n, d)
    h = jnp.asarray(h, jnp.float32)            # (d,)
    n, d = mu.shape
    assert n <= n_pad
    const = -jnp.sum(jnp.log(h)) - 0.5 * d * _LOG_2PI
    inv_h2 = 1.0 / (h * h)                     # (d,)
    pre = log_w + const - 0.5 * jnp.sum(mu * mu * inv_h2, axis=-1)  # (n,)
    mu_s = mu * inv_h2                         # (n, d)
    mu_s = jnp.pad(mu_s, ((0, n_pad - n), (0, d_pad - d)))
    pre = jnp.pad(pre, (0, n_pad - n), constant_values=_NEG)[:, None]
    inv2h = jnp.pad(inv_h2, (0, d_pad - d))[:, None]
    return ResidentProposal(mu_s, pre, inv2h)


def resident_from_gaussian(loc, scale, d_pad: int,
                           n_pad: int = _SUB) -> ResidentProposal:
    """Diagonal Gaussian (the first-epoch iSIR proposal,
    ``AGLMCMC.py:137-138``) as a 1-component resident mixture.  ``n_pad``
    must be the kernel's ``n_pad``."""
    loc = jnp.asarray(loc, jnp.float32).reshape(1, -1)
    d = loc.shape[1]
    scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), (d,))
    # exact: one component of weight 1 (log(1 + 1e-10) to match the KDE
    # stabilizer is NOT applied here — the reference evaluates the exact
    # parametric density for num_train == 0)
    return _build_resident(loc, scale, jnp.zeros((1,)), d_pad, n_pad)


def resident_from_kde(kde, d_pad: int, n_pad: int) -> ResidentProposal:
    """A fitted :class:`~glabc_tpu.models.kde.KernelDensity` (shared across
    chains) as the resident mixture; numerically matches ``kde.log_prob``
    including the ``log(w + 1e-10)`` stabilizer (``kernel_density.py:125``).
    ``n_pad`` must be the kernel's ``n_pad`` (pad rows contribute 0 mass).
    """
    return _build_resident(kde.X, kde.bandwidth,
                           jnp.log(kde.weights + 1e-10), d_pad, n_pad)


class PoolISIRMixed(ConfigHashable):
    """Fused pool-iSIR + Mixture local-RW kernel (``global_frequency < 1``).

    One ``run`` call advances every chain ``steps_per_call`` transitions;
    step ``t`` streams pool slice ``t`` (candidate thetas, datasets,
    log-weights, kernel values) and flips a per-chain coin.  Chain state —
    ``theta``, its dataset ``y`` (both ``(d_pad, C)``), and the carried
    epsilon-kernel value ``(1, C)`` — stays VMEM-resident across the segment
    via revisited output blocks of a ``(chain_blocks, steps)`` grid, exactly
    like :class:`~glabc_tpu.ops.pallas.pool_isir_kernel.PoolISIR`.
    """

    def __init__(self, theta_dim: int, y_obs=None, *, epsilon: float = 0.05,
                 sigma: float = 0.05, global_frequency: float = 0.5,
                 batch_size: int = 5, steps_per_call: int = 400,
                 lp_scale: float = 0.35, prior_loc: float = 0.0,
                 prior_scale: float = 1.0, block_chains: int = 1024,
                 n_support: int = 4096, support_chunk: int = 512,
                 collect_history: bool = True, interpret: bool = False,
                 program=None):
        """``program``: an optional
        :class:`~glabc_tpu.ops.pallas.generic_kernel.TileProgram` replacing
        the hardcoded Mixture-family local move, prior, simulator, and
        epsilon-kernel with arbitrary tile callables (the reference's local
        move is problem-agnostic, ``AGLMCMC.py:255-272``); it must define
        ``prior_lp``.  The iSIR-over-pool global move and the resident-KDE
        proposal density are problem-independent either way.  With a
        program, ``y_obs``/``epsilon``/``sigma``/``lp_scale``/``prior_*``
        are ignored (the program closes over them) and the ``y`` state tile
        carries ``program.y_rows`` live rows."""
        self.d = int(theta_dim)
        self.d_pad = max(_SUB, _round_up(self.d, _SUB))
        self.p = program
        if program is not None:
            assert program.prior_lp is not None, (
                "PoolISIRMixed needs TileProgram.prior_lp (standalone log "
                "prior) for the carried-state iSIR weight")
            assert program.theta_dim == self.d
            assert program.y_rows <= self.d_pad
            y_obs = np.zeros((self.d,), np.float32)  # unused with a program
        self.y_obs = np.broadcast_to(
            np.asarray(y_obs, np.float32).reshape(-1), (self.d,))
        self.eps = float(epsilon)
        self.sigma = float(sigma)
        self.gf = float(global_frequency)
        self.B = int(batch_size)
        assert 1 <= self.B <= _SUB - 1
        self.lp_scale = float(lp_scale)
        self.prior_loc = float(prior_loc)
        self.prior_scale = float(prior_scale)
        self.T = int(steps_per_call)
        self.C_blk = int(block_chains)
        assert self.C_blk % 128 == 0
        self.chunk = int(min(support_chunk, _round_up(n_support, _SUB)))
        self.n_pad = _round_up(max(n_support, _SUB), self.chunk)
        self.collect_history = bool(collect_history)
        self.interpret = bool(interpret)

    # ------------------------------------------------------------- kernel
    def _kernel(self, seed_ref, yobs_ref, mu_ref, pre_ref, inv2h_ref,
                ptheta_ref, px_ref, plogw_ref, plogk_ref,
                theta_in_ref, y_in_ref, logk_in_ref,
                theta_ref, y_ref, logk_ref, gatt_ref, gacc_ref, lacc_ref,
                hist_ref):
        d, B, C, T = self.d, self.B, self.C_blk, self.T
        eps, sigma, gf = self.eps, self.sigma, self.gf
        i = pl.program_id(0)
        t = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + (i * T + t) * np.int32(SEED_STRIDE))

        @pl.when(t == 0)
        def _():
            theta_ref[:] = theta_in_ref[:]
            y_ref[:] = y_in_ref[:]
            logk_ref[:] = logk_in_ref[:]
            gatt_ref[:] = jnp.zeros((1, C), jnp.float32)
            gacc_ref[:] = jnp.zeros((1, C), jnp.float32)
            lacc_ref[:] = jnp.zeros((1, C), jnp.float32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (self.d_pad, 1), 0)
        mask = (rows < d).astype(jnp.float32)

        if self.p is not None:
            from .generic_kernel import TileLib
            tl = TileLib(self.d_pad, C)

            def prior_lp(th):
                return self.p.prior_lp(tl, th)

            def local_move(theta_, logk_):
                thl_ = self.p.sample_local(tl, theta_)
                yl_ = self.p.simulate(tl, thl_)
                logkl_ = self.p.log_kernel(tl, yl_)
                log_acc_ = (self.p.prior_diff_lp(tl, thl_, theta_)
                            + logkl_ - logk_)
                return thl_, yl_, logkl_, log_acc_
        else:
            y_obs = jnp.zeros((self.d_pad, 1), jnp.float32)
            for j in range(d):
                y_obs = jnp.where(rows == j, yobs_ref[j], y_obs)

            def prior_lp(th):
                z = (th - self.prior_loc) / self.prior_scale
                per = (-0.5 * _LOG_2PI - np.log(self.prior_scale)
                       - 0.5 * z * z) * mask
                return jnp.sum(per, axis=0, keepdims=True)

            def kernel_lp(yv):
                diff = (yv - y_obs) * mask
                dis2 = jnp.sum(diff * diff, axis=0, keepdims=True)
                return ((-0.5 * _LOG_2PI - np.log(eps))
                        - 0.5 * dis2 / (eps * eps))

            def local_move(theta_, logk_):
                n1, n2 = _normal_pair((self.d_pad, C))
                thl_ = (theta_ + self.lp_scale * n1) * mask
                yl_ = (jnp.abs(thl_) + sigma * n2) * mask
                logkl_ = kernel_lp(yl_)
                log_acc_ = (prior_lp(thl_) + logkl_
                            - prior_lp(theta_) - logk_)
                return thl_, yl_, logkl_, log_acc_

        theta = theta_ref[:]
        y = y_ref[:]
        logk = logk_ref[:]

        # ---- resident proposal density at the current state (the
        # reference's per-global-move KDE.log_prob, AGLMCMC.py:137-141)
        m = jnp.full((1, C), _NEG, jnp.float32)
        s = jnp.zeros((1, C), jnp.float32)
        for c0 in range(0, self.n_pad, self.chunk):
            sc = jax.lax.dot_general(
                mu_ref[c0:c0 + self.chunk, :], theta,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + pre_ref[c0:c0 + self.chunk, :]
            cm = jnp.max(sc, axis=0, keepdims=True)
            m_new = jnp.maximum(m, cm)
            s = (s * jnp.exp(m - m_new)
                 + jnp.sum(jnp.exp(sc - m_new), axis=0, keepdims=True))
            m = m_new
        q2 = jnp.sum(theta * theta * inv2h_ref[:], axis=0, keepdims=True)
        logq_cur = jnp.log(s) + m - 0.5 * q2
        logw_cur = prior_lp(theta) + logk - logq_cur

        # ---- global branch: iSIR over pool slice t (streaming Gumbel-max)
        g = _gumbel((_SUB, C))
        best = logw_cur + g[B:B + 1, :]
        b_theta, b_y, b_logk = theta, y, logk
        b_moved = jnp.zeros((1, C), jnp.float32)
        for j in range(B):
            score = plogw_ref[0, j:j + 1, :] + g[j:j + 1, :]
            upd = score > best
            best = jnp.where(upd, score, best)
            b_theta = jnp.where(upd, ptheta_ref[0, j], b_theta)
            b_y = jnp.where(upd, px_ref[0, j], b_y)
            b_logk = jnp.where(upd, plogk_ref[0, j:j + 1, :], b_logk)
            b_moved = jnp.where(upd, 1.0, b_moved)

        # ---- local branch: random-walk MH (Mixture family hardcoded, or
        # the TileProgram's arbitrary move; reference AGLMCMC.py:255-289)
        thl, yl, logkl, l_log_acc = local_move(theta, logk)
        l_acc = jnp.log(_uniform((1, C))) < l_log_acc
        l_theta = jnp.where(l_acc, thl, theta)
        l_y = jnp.where(l_acc, yl, y)
        l_logk = jnp.where(l_acc, logkl, logk)
        l_acc_f = l_acc.astype(jnp.float32)

        # ---- per-chain coin (AGLMCMC.py:126)
        is_g = _uniform((1, C)) < gf
        is_g_f = is_g.astype(jnp.float32)
        new_theta = jnp.where(is_g, b_theta, l_theta)
        theta_ref[:] = new_theta
        y_ref[:] = jnp.where(is_g, b_y, l_y)
        logk_ref[:] = jnp.where(is_g, b_logk, l_logk)
        gatt_ref[:] = gatt_ref[:] + is_g_f
        gacc_ref[:] = gacc_ref[:] + is_g_f * b_moved
        lacc_ref[:] = lacc_ref[:] + (1.0 - is_g_f) * l_acc_f
        if self.collect_history:
            hist_ref[0] = new_theta

    # --------------------------------------------------------------- call
    @functools.partial(jax.jit, static_argnums=(0,))
    def run(self, seed, resident: ResidentProposal, pool_theta, pool_x,
            pool_logw, pool_logk, theta, y, logk):
        """Run ``steps_per_call`` fused mixed transitions.

        Args: ``seed`` int32 scalar; ``resident`` (see
        :class:`ResidentProposal`, padded to this kernel's ``n_pad``);
        ``pool_theta``/``pool_x`` ``(T, B, d_pad, C)``;
        ``pool_logw``/``pool_logk`` ``(T, 8, C)`` (see ``pack_pool_*``);
        ``theta``/``y`` ``(d_pad, C)``; ``logk`` ``(1, C)``.

        Returns ``(theta, y, logk, gatt, gacc, lacc, history|None)`` with
        the three counters ``(1, C)`` float32.
        """
        C = theta.shape[-1]
        assert C % self.C_blk == 0
        assert resident.mu_scaled.shape[0] == self.n_pad, (
            f"resident proposal padded to {resident.mu_scaled.shape[0]}, "
            f"kernel built for n_pad={self.n_pad}")
        n_blk = C // self.C_blk
        dp, T, B = self.d_pad, self.T, self.B

        grid = (n_blk, T)
        resid = lambda i, t: tuple(0 for _ in range(2))  # noqa: E731
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
        mu_spec = pl.BlockSpec((self.n_pad, dp), resid,
                               memory_space=pltpu.VMEM)
        pre_spec = pl.BlockSpec((self.n_pad, 1), resid,
                                memory_space=pltpu.VMEM)
        inv2h_spec = pl.BlockSpec((dp, 1), resid, memory_space=pltpu.VMEM)
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
                pl.BlockSpec(memory_space=pltpu.SMEM),
                mu_spec, pre_spec, inv2h_spec,
                ptheta_spec, ptheta_spec, plogw_spec, plogw_spec,
                state_spec, state_spec, row_spec,
            ],
            out_specs=(state_spec, state_spec, row_spec,
                       row_spec, row_spec, row_spec, hist_spec),
            out_shape=(
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                hist_shape,
            ),
            interpret=pltpu.InterpretParams() if self.interpret else False,
        )(jnp.asarray([seed], jnp.int32), jnp.asarray(self.y_obs),
          resident.mu_scaled, resident.pre, resident.inv2h,
          pool_theta, pool_x, pool_logw, pool_logk, theta, y, logk)
        theta_n, y_n, logk_n, gatt, gacc, lacc, hist = out
        return (theta_n, y_n, logk_n, gatt, gacc, lacc,
                hist if self.collect_history else None)

    # ---------------------------------------------------------- multi-chip
    def make_sharded_run(self, mesh):
        """Multi-chip :meth:`run`: chain (lane) axis of state and pools
        sharded over a 1-D mesh, resident proposal replicated, per-device
        ``pallas_call`` inside ``shard_map`` with zero collectives; device
        PRNG seeds tile the single-grid ``seed + (i*T + t) * stride``
        stream pattern (same scheme as ``PoolISIR.make_sharded_run``)."""
        from jax.sharding import PartitionSpec as P

        from ...parallel.mesh import CHAIN_AXIS

        T, C_blk = self.T, self.C_blk

        def worker(seed, resident, ptheta, px, plogw, plogk, theta, y, logk):
            my = jax.lax.axis_index(CHAIN_AXIS)
            n_blk_local = theta.shape[-1] // C_blk
            seed_dev = (seed
                        + my.astype(jnp.int32)
                        * jnp.int32(n_blk_local * T)
                        * jnp.int32(SEED_STRIDE))
            return self.run(seed_dev, resident, ptheta, px, plogw, plogk,
                            theta, y, logk)

        row = P(None, CHAIN_AXIS)
        pool4 = P(None, None, None, CHAIN_AXIS)
        pool3 = P(None, None, CHAIN_AXIS)
        out_specs = (row, row, row, row, row, row,
                     (P(None, None, CHAIN_AXIS) if self.collect_history
                      else None))
        sharded = jax.shard_map(
            worker, mesh=mesh,
            in_specs=(P(), P(), pool4, pool4, pool3, pool3, row, row, row),
            out_specs=out_specs,
            check_vma=False,
        )
        return jax.jit(sharded)
