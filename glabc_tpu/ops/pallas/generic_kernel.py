"""Generic fused GLMCMC/GlobalMCMC kernel builder: user problems on the
Pallas path without writing Pallas.

The specialized kernels (``mixture_kernel.py``, ``packed_kernel.py``)
hardcode the Mixture family.  This module factors the transition loop out
from the problem: a :class:`TileProgram` describes the ABC problem +
proposals as a handful of tile-level callables (simulate, epsilon-kernel,
prior/proposal log-density pieces), and :class:`GenericFusedGLMCMC` welds
them into the same fused VMEM-resident transition loop — streaming-argmax
iSIR or independence-MH global move + RW-MH local move, on-chip PRNG,
``steps_per_call`` transitions per launch (the reference hot loop,
``GLMCMC.py:58-104`` / ``GlobalMCMC.py:37-68``).

Program callables receive a :class:`TileLib` helper (``tl``) bound to the
kernel's ``(d_pad, C)`` tile shape: PRNG draws (``tl.normal_pair()``,
``tl.uniform()``), masked row reductions (``tl.rowsum(x, n)``), row
extraction/building (``tl.row``, ``tl.from_rows``, ``tl.const_col``).
Anything expressible with these + elementwise jnp ops (including
``lax.fori_loop`` — e.g. streaming time-series simulators) gets the fused
path; see ``ma2_tile_program`` for a worked non-Mixture example and
``mixture_tile_program`` for the canonical family.

Layout matches ``mixture_kernel.py``: state ``(d_pad=8, C)``, event rows on
sublanes, chains on lanes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sharding import SEED_STRIDE

from .mixture_kernel import (
    FusedStats,
    _gumbel,
    _normal_pair,
    _uniform,
)

__all__ = ["TileLib", "TileProgram", "GenericFusedGLMCMC",
           "mixture_tile_program", "ma2_tile_program"]

_LOG_2PI = float(np.log(2.0 * np.pi))
_SUB = 8
_NEG = -1e30  # -inf stand-in: never wins an argmax / always rejects,
              # without generating nan through (-inf) - (-inf)


class TileLib:
    """Kernel-side helper namespace bound to the tile shape ``(d_pad, C)``.

    PRNG draws advance the per-core stream seeded by the kernel; reductions
    mask to the first ``n`` sublane rows."""

    def __init__(self, d_pad: int, C: int):
        self.d_pad = int(d_pad)
        self.C = int(C)
        self.shape = (self.d_pad, self.C)
        self._rows = jax.lax.broadcasted_iota(jnp.int32, (self.d_pad, 1), 0)

    # ---- PRNG ----------------------------------------------------------
    def normal_pair(self):
        """Two independent N(0,1) tiles from one Box-Muller draw."""
        return _normal_pair(self.shape)

    def normal(self):
        """One N(0,1) tile (prefer ``normal_pair`` when consuming pairs)."""
        n1, _ = _normal_pair(self.shape)
        return n1

    def uniform(self):
        """U(0,1) tile, strictly inside (0, 1)."""
        return _uniform(self.shape)

    def gumbel(self):
        return _gumbel(self.shape)

    # ---- rows ----------------------------------------------------------
    def mask(self, n: int):
        """(d_pad, 1) float mask of the first ``n`` rows."""
        return (self._rows < n).astype(jnp.float32)

    def rowsum(self, x, n: int):
        """Masked sum of the first ``n`` rows -> (1, C)."""
        return jnp.sum(x * self.mask(n), axis=0, keepdims=True)

    def row(self, x, i: int):
        """Extract row ``i`` broadcastably -> (1, C)."""
        sel = (self._rows == i).astype(jnp.float32)
        return jnp.sum(x * sel, axis=0, keepdims=True)

    def from_rows(self, values):
        """Build a tile from per-row (1, C) values (rows beyond
        ``len(values)`` are zero)."""
        out = jnp.zeros(self.shape, jnp.float32)
        for i, v in enumerate(values):
            out = out + v * (self._rows == i).astype(jnp.float32)
        return out

    def const_col(self, values):
        """(d_pad, 1) column with the given python-float row values."""
        out = jnp.zeros((self.d_pad, 1), jnp.float32)
        for i, v in enumerate(values):
            out = jnp.where(self._rows == i, float(v), out)
        return out


@dataclasses.dataclass(frozen=True)
class TileProgram:
    """Tile-level description of an ABC problem + proposals.

    Every callable takes the :class:`TileLib` helper first; theta/y tiles
    are ``(d_pad, C)`` float32 with the leading ``theta_dim``/``y_rows``
    rows live (rows beyond must be kept finite — zero is fine).  Log
    densities are ``(1, C)``; use ``_NEG``-style large negatives (not
    ``-inf``) for out-of-support.
    """

    theta_dim: int
    y_rows: int
    # global/importance proposal: draw a candidate theta tile
    sample_global: Callable
    # theta tile -> simulated-summaries tile (may draw noise, may fori_loop)
    simulate: Callable
    # y tile -> (1, C) log epsilon-kernel
    log_kernel: Callable
    # theta -> (1, C) log prior(theta) - log q_global(theta)
    prior_minus_global_lp: Callable
    # (a, b) -> (1, C) log prior(a) - log prior(b), finite for b in support
    prior_diff_lp: Callable
    # current theta tile -> local RW proposal tile
    sample_local: Callable
    # theta -> (1, C) log prior(theta) ALONE (no proposal term) — needed by
    # pool-based kernels whose proposal density is the resident KDE,
    # evaluated in-kernel (PoolISIRMixed); optional for the parametric
    # GenericFusedGLMCMC path
    prior_lp: Callable | None = None
    # y tile -> (1, C) discrepancy (the statistic whose mean/variance feed
    # GLMALA's Gaussian synthetic likelihood, ``GLMALA.py:86-94``) — needed
    # by GenericFusedGLMALA only
    discrepancy: Callable | None = None
    # theta -> (d_pad, C) grad log prior (pad rows zero) — needed by
    # GenericFusedGLMALA (the scan path's ``problem.prior_grad``)
    prior_grad: Callable | None = None


class GenericFusedGLMCMC:
    """Fused transition loop for an arbitrary :class:`TileProgram`.

    Same Markov kernels and call contract as
    :class:`~glabc_tpu.ops.pallas.mixture_kernel.FusedMixtureGLMCMC` —
    ``algorithm='glmcmc'`` (iSIR global move) or ``'global'``
    (independence MH); ``run(seed, theta, y, logk)`` advances
    ``steps_per_call`` transitions and returns
    ``(theta, y, logk, history|None, FusedStats)``.
    """

    def __init__(self, program: TileProgram, *,
                 global_frequency: float = 0.9, batch_size: int = 5,
                 steps_per_call: int = 256, block_chains: int = 512,
                 collect_history: bool = True, interpret: bool = False,
                 algorithm: str = "glmcmc"):
        assert algorithm in ("glmcmc", "global")
        self.p = program
        self.d = int(program.theta_dim)
        self.d_pad = max(_SUB, ((self.d + _SUB - 1) // _SUB) * _SUB)
        assert program.y_rows <= self.d_pad
        self.gf = float(global_frequency)
        self.B = int(batch_size)
        self.T = int(steps_per_call)
        self.C_blk = int(block_chains)
        self.collect_history = bool(collect_history)
        self.interpret = bool(interpret)
        self.algorithm = algorithm
        assert self.C_blk % 128 == 0

    # ------------------------------------------------------------- kernel
    def _kernel(self, seed_ref, theta_ref, y_ref, logk_ref,
                theta_out_ref, y_out_ref, logk_out_ref, hist_ref,
                acc_ref, gatt_ref, gacc_ref, lacc_ref):
        p, gf, B, C = self.p, self.gf, self.B, self.C_blk
        tl = TileLib(self.d_pad, C)

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * np.int32(SEED_STRIDE))

        def body(t, state):
            theta, y, logk, acc, gatt, gacc, lacc = state

            if self.algorithm == "glmcmc":
                # -------- global branch: iSIR streaming Gumbel argmax
                logw_old = p.prior_minus_global_lp(tl, theta) + logk
                w_score = logw_old + _gumbel((1, C))
                w_theta, w_y, w_logk = theta, y, logk
                w_moved = jnp.zeros((1, C), jnp.float32)
                for _ in range(B):
                    thp = p.sample_global(tl)
                    yp = p.simulate(tl, thp)
                    logkp = p.log_kernel(tl, yp)
                    logw = p.prior_minus_global_lp(tl, thp) + logkp
                    score = logw + _gumbel((1, C))
                    upd = score > w_score
                    w_score = jnp.where(upd, score, w_score)
                    w_theta = jnp.where(upd, thp, w_theta)
                    w_y = jnp.where(upd, yp, w_y)
                    w_logk = jnp.where(upd, logkp, w_logk)
                    w_moved = jnp.where(upd, 1.0, w_moved)
            else:
                # -------- global branch: independence MH
                thp = p.sample_global(tl)
                yp = p.simulate(tl, thp)
                logkp = p.log_kernel(tl, yp)
                log_acc = (p.prior_minus_global_lp(tl, thp) + logkp
                           - p.prior_minus_global_lp(tl, theta) - logk)
                g_acc = jnp.log(_uniform((1, C))) < log_acc
                w_theta = jnp.where(g_acc, thp, theta)
                w_y = jnp.where(g_acc, yp, y)
                w_logk = jnp.where(g_acc, logkp, logk)
                w_moved = jnp.where(g_acc, 1.0, 0.0)

            # ------------ local branch: random-walk MH
            thl = p.sample_local(tl, theta)
            yl = p.simulate(tl, thl)
            logkl = p.log_kernel(tl, yl)
            log_acc = p.prior_diff_lp(tl, thl, theta) + logkl - logk
            l_acc = jnp.log(_uniform((1, C))) < log_acc
            l_theta = jnp.where(l_acc, thl, theta)
            l_y = jnp.where(l_acc, yl, y)
            l_logk = jnp.where(l_acc, logkl, logk)

            # ------------ coin flip
            is_g = _uniform((1, C)) < gf
            theta = jnp.where(is_g, w_theta, l_theta)
            y = jnp.where(is_g, w_y, l_y)
            logk = jnp.where(is_g, w_logk, l_logk)
            moved = jnp.where(is_g, w_moved, jnp.where(l_acc, 1.0, 0.0))
            acc = acc + moved
            is_g_f = is_g.astype(jnp.float32)
            gatt = gatt + is_g_f
            gacc = gacc + is_g_f * w_moved
            lacc = lacc + (1.0 - is_g_f) * jnp.where(l_acc, 1.0, 0.0)

            if self.collect_history:
                hist_ref[t] = theta
            return theta, y, logk, acc, gatt, gacc, lacc

        z = jnp.zeros((1, C), jnp.float32)
        theta, y, logk, acc, gatt, gacc, lacc = jax.lax.fori_loop(
            0, self.T, body,
            (theta_ref[:], y_ref[:], logk_ref[:], z, z, z, z),
        )
        theta_out_ref[:] = theta
        y_out_ref[:] = y
        logk_out_ref[:] = logk
        acc_ref[:] = acc
        gatt_ref[:] = gatt
        gacc_ref[:] = gacc
        lacc_ref[:] = lacc

    # --------------------------------------------------------------- call
    @functools.partial(jax.jit, static_argnums=(0,))
    def run(self, seed, theta, y, logk):
        """``theta``/``y``: ``(d_pad, C)``; ``logk``: ``(1, C)``."""
        C = theta.shape[-1]
        assert C % self.C_blk == 0
        n_blk = C // self.C_blk
        dp = self.d_pad
        T = self.T

        state_spec = pl.BlockSpec((dp, self.C_blk), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        logk_spec = pl.BlockSpec((1, self.C_blk), lambda i: (0, i),
                                 memory_space=pltpu.VMEM)
        hist_T = T if self.collect_history else 1
        hist_spec = pl.BlockSpec((hist_T, dp, self.C_blk),
                                 lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            self._kernel,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                state_spec, state_spec, logk_spec,
            ],
            out_specs=(state_spec, state_spec, logk_spec, hist_spec,
                       logk_spec, logk_spec, logk_spec, logk_spec),
            out_shape=(
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((hist_T, dp, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ),
            interpret=pltpu.InterpretParams() if self.interpret else False,
        )(jnp.asarray(seed, jnp.int32).reshape(1), theta, y, logk)
        theta_n, y_n, logk_n, hist, acc, gatt, gacc, lacc = out
        stats = FusedStats(accepted=acc, global_attempts=gatt,
                           global_accepts=gacc, local_accepts=lacc)
        return (theta_n, y_n, logk_n,
                (hist if self.collect_history else None), stats)

    def make_sharded_run(self, mesh):
        """Chain-axis ``shard_map`` variant of :meth:`run` — see
        :func:`~glabc_tpu.ops.pallas.sharding.make_sharded_kernel_run`."""
        from .sharding import make_sharded_kernel_run
        return make_sharded_kernel_run(self.run, self.C_blk, 3, 0,
                                       FusedStats, self.collect_history,
                                       mesh)


# ======================================================================
# canonical programs
# ======================================================================

def mixture_tile_program(problem, *, ip_loc=0.0, ip_scale=1.0,
                         lp_scale=0.35, prior_loc=0.0, prior_scale=1.0
                         ) -> TileProgram:
    """The Mixture family (``examples/Mixture.py:5-53``) as a TileProgram:
    Gaussian prior/proposals, ``y = |theta| + sigma z``, Euclidean
    discrepancy, Gaussian epsilon-kernel.  Functionally identical to
    :class:`FusedMixtureGLMCMC` — used as the cross-check that the generic
    builder reproduces the specialized kernel's posterior."""
    d = int(problem.theta_dim)
    sigma = float(problem._noise_std)
    eps = float(problem.epsilon)
    y_obs = [float(v) for v in np.asarray(problem.y_obs).reshape(-1)]
    ps2, is2 = float(prior_scale) ** 2, float(ip_scale) ** 2
    # prior - ip as one quadratic (constants as in packed_kernel)
    q2 = 0.5 * (1.0 / is2 - 1.0 / ps2)
    q1 = prior_loc / ps2 - ip_loc / is2
    q0 = (np.log(ip_scale) - np.log(prior_scale)
          - 0.5 * prior_loc ** 2 / ps2 + 0.5 * ip_loc ** 2 / is2)

    def sample_global(tl):
        n1, n2 = tl.normal_pair()
        tl._mix_noise = n2            # pair the simulator draw (RNG economy)
        return (ip_loc + ip_scale * n1) * tl.mask(d)

    def simulate(tl, th):
        n2 = getattr(tl, "_mix_noise", None)
        if n2 is None:
            n2 = tl.normal()
        tl._mix_noise = None
        return (jnp.abs(th) + sigma * n2) * tl.mask(d)

    def log_kernel(tl, y):
        diff = (y - tl.const_col(y_obs)) * tl.mask(d)
        dis2 = tl.rowsum(diff * diff, d)
        return (-0.5 * _LOG_2PI - np.log(eps)) - 0.5 * dis2 / (eps * eps)

    def prior_minus_global_lp(tl, th):
        return tl.rowsum((q2 * th + q1) * th + q0, d)

    def prior_diff_lp(tl, a, b):
        za, zb = a - prior_loc, b - prior_loc
        return tl.rowsum((zb * zb - za * za) * (0.5 / ps2), d)

    def sample_local(tl, th):
        n1, n2 = tl.normal_pair()
        tl._mix_noise = n2
        return (th + lp_scale * n1) * tl.mask(d)

    def prior_lp(tl, th):
        z = (th - prior_loc) / prior_scale
        per = (-0.5 * _LOG_2PI - np.log(prior_scale) - 0.5 * z * z)
        return tl.rowsum(per, d)

    def discrepancy(tl, y):
        diff = (y - tl.const_col(y_obs)) * tl.mask(d)
        return jnp.sqrt(tl.rowsum(diff * diff, d))

    def prior_grad(tl, th):
        return (-(th - prior_loc) / ps2) * tl.mask(d)

    return TileProgram(theta_dim=d, y_rows=d, sample_global=sample_global,
                       simulate=simulate, log_kernel=log_kernel,
                       prior_minus_global_lp=prior_minus_global_lp,
                       prior_diff_lp=prior_diff_lp,
                       sample_local=sample_local, prior_lp=prior_lp,
                       discrepancy=discrepancy, prior_grad=prior_grad)


def ma2_tile_program(problem, *, lp_scale=0.1) -> TileProgram:
    """MA(2) time-series ABC (:class:`~glabc_tpu.models.problems.MA2Problem`)
    as a TileProgram — the non-Mixture demonstration of the generic fused
    path.  The simulator is a streaming ``lax.fori_loop`` over the series:
    per step one fresh innovation tile, the running pair of lagged
    innovations/observations, and accumulating lag-0/1/2 autocovariance
    sums — no series buffer is ever materialized (VMEM-free in series
    length).

    Global/importance proposal: uniform over the box
    ``[-2, 2] x [-1, 1]`` (covers the triangular prior support;
    out-of-triangle candidates get ~-inf weight, the masked-weight
    treatment of support constraints).  Local move: isotropic Gaussian RW.
    """
    T = int(problem.num_draws)
    eps = float(problem.epsilon)
    y_obs = [float(v) for v in np.asarray(problem.y_obs).reshape(-1)]
    log_p_minus_q = float(np.log(8.0 / 4.0))   # box area 8, triangle area 4

    def _inside(tl, th):
        th1, th2 = tl.row(th, 0), tl.row(th, 1)
        return ((th2 < 1.0) & (th2 > th1 - 1.0) & (th2 > -th1 - 1.0))

    def sample_global(tl):
        u = tl.uniform()
        lo = tl.const_col([-2.0, -1.0])
        hi = tl.const_col([2.0, 1.0])
        return (lo + (hi - lo) * u) * tl.mask(2)

    def simulate(tl, th):
        th1, th2 = tl.row(th, 0), tl.row(th, 1)
        e2, e1 = _normal_pair((1, tl.C))     # e_{t-2}, e_{t-1} warm-up draws
        # derive the zero carries from a drawn tile: jnp.zeros would get a
        # replicated Mosaic layout, clashing with the loop body's concrete
        # layout ("Invalid relayout ... replicated in destination")
        zero = e1 * 0.0
        rows = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
        row_ge1 = (rows >= 1).astype(jnp.float32)
        row_ge2 = (rows >= 2).astype(jnp.float32)
        row0 = (rows == 0).astype(jnp.float32)
        row1 = (rows == 1).astype(jnp.float32)

        def block8(E, carry):
            """Advance 8 timesteps at once: innovations for steps
            t..t+7 live on the 8 sublane rows of ``E``; the lag-1/2 series
            are the same tile rolled down 1/2 rows with the top rows
            patched from the previous block's tail (carried scalars).
            Full VPU sublane utilization vs the 1-row scalar recursion."""
            e1, e2, y1, y2, s0, s1, s2 = carry
            Em1 = pltpu.roll(E, 1, axis=0) * row_ge1 + e1 * row0
            Em2 = (pltpu.roll(E, 2, axis=0) * row_ge2 + e2 * row0
                   + e1 * row1)
            Y = E + th1 * Em1 + th2 * Em2
            Ym1 = pltpu.roll(Y, 1, axis=0) * row_ge1 + y1 * row0
            Ym2 = (pltpu.roll(Y, 2, axis=0) * row_ge2 + y2 * row0
                   + y1 * row1)
            return (tl.row(E, 7), tl.row(E, 6), tl.row(Y, 7), tl.row(Y, 6),
                    s0 + tl.rowsum(Y * Y, _SUB),
                    s1 + tl.rowsum(Y * Ym1, _SUB),
                    s2 + tl.rowsum(Y * Ym2, _SUB))

        def pair_step(t, carry):
            EA, EB = _normal_pair((_SUB, tl.C))   # 16 innovations per draw
            return block8(EB, block8(EA, carry))

        def scalar_step(t, carry):
            e1, e2, y1, y2, s0, s1, s2 = carry
            e = _normal_pair((1, tl.C))[0]
            yt = e + th1 * e1 + th2 * e2
            return (e, e1, yt, y1,
                    s0 + yt * yt, s1 + yt * y1, s2 + yt * y2)

        carry = (e1, e2, zero, zero, zero, zero, zero)
        carry = jax.lax.fori_loop(0, T // 16, pair_step, carry)
        carry = jax.lax.fori_loop(0, T % 16, scalar_step, carry)
        s0, s1, s2 = carry[4:]
        inv_t = 1.0 / T
        return tl.from_rows([s0 * inv_t, s1 * inv_t, s2 * inv_t])

    def log_kernel(tl, y):
        diff = (y - tl.const_col(y_obs)) * tl.mask(3)
        dis2 = tl.rowsum(diff * diff, 3)
        return (-0.5 * _LOG_2PI - np.log(eps)) - 0.5 * dis2 / (eps * eps)

    def prior_minus_global_lp(tl, th):
        return jnp.where(_inside(tl, th), log_p_minus_q, _NEG)

    def prior_diff_lp(tl, a, b):
        # b is the current state (always in support)
        return jnp.where(_inside(tl, a), 0.0, _NEG)

    def sample_local(tl, th):
        return (th + lp_scale * tl.normal()) * tl.mask(2)

    def prior_lp(tl, th):
        # uniform over the area-4 triangle (MA2Problem.prior_log_prob)
        return jnp.where(_inside(tl, th), float(np.log(0.25)), _NEG)

    def discrepancy(tl, y):
        diff = (y - tl.const_col(y_obs)) * tl.mask(3)
        return jnp.sqrt(tl.rowsum(diff * diff, 3))

    def prior_grad(tl, th):
        # flat inside the triangle; the scan path's autodiff prior_grad is
        # likewise zero a.e. (MA2Problem.prior_log_prob is where(inside,
        # const, -inf))
        return th * 0.0

    return TileProgram(theta_dim=2, y_rows=3, sample_global=sample_global,
                       simulate=simulate, log_kernel=log_kernel,
                       prior_minus_global_lp=prior_minus_global_lp,
                       prior_diff_lp=prior_diff_lp,
                       sample_local=sample_local, prior_lp=prior_lp,
                       discrepancy=discrepancy, prior_grad=prior_grad)
