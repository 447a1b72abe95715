"""Packed fused GLMCMC kernel: multiple chains per sublane tile.

The plain fused kernel (``mixture_kernel.py``) lays state out as
``(d_pad=8, C)`` — for the canonical d=2 Mixture problem 6 of 8 sublanes are
padding, so 75% of RNG bits and VPU lanes are wasted.  This kernel packs
``pack = 8 // d`` chains into each sublane group: state is ``(8, C)`` with
rows ``[c0.d0, c0.d1, c1.d0, c1.d1, ...]`` — every row is live, quadrupling
(for d=2) the chains processed per tile op.

Event-dimension reductions become sublane group-sums built from
``pltpu.roll``: ``group_sum(x) = broadcast_leaders(mask_leaders(sum_j
roll(x, -j)))`` — d rolls + d adds instead of one cross-row reduce, all
native sublane rotates.

Same Markov kernel as the scan/unpacked paths (GLMCMC: iSIR global +
RW-MH local, reference ``GLMCMC.py:58-104``); validated against them
statistically on hardware.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._hashable import ConfigHashable
from .sharding import SEED_STRIDE

from .mixture_kernel import _gumbel, _normal_pair, _uniform

__all__ = ["PackedMixtureGLMCMC", "packed_state_init", "unpack_history"]

_LOG_2PI = float(np.log(2.0 * np.pi))
_SUB = 8


class PackedStats(NamedTuple):
    accepted: jnp.ndarray        # (8, C) per packed chain row-group leader
    global_attempts: jnp.ndarray
    global_accepts: jnp.ndarray
    local_accepts: jnp.ndarray


class PackedMixtureGLMCMC(ConfigHashable):
    """Fused GLMCMC with sublane chain packing for ``d in {1, 2, 4, 8}``."""

    def __init__(self, theta_dim: int, y_obs, *, epsilon: float,
                 sigma: float, global_frequency: float = 0.9,
                 batch_size: int = 5, prior_loc=0.0, prior_scale=1.0,
                 ip_loc=0.0, ip_scale=1.0, lp_scale=0.35,
                 steps_per_call: int = 256, block_chains: int = 512,
                 collect_history: bool = True, interpret: bool = False,
                 algorithm: str = "glmcmc"):
        """``algorithm``: ``'glmcmc'`` (iSIR global move, reference
        ``GLMCMC.py:66-89``) or ``'global'`` (independence-MH global move,
        reference ``GlobalMCMC.py:39-53``; ``batch_size`` is ignored)."""
        assert _SUB % theta_dim == 0, "packed kernel needs d | 8"
        assert algorithm in ("glmcmc", "global")
        self.algorithm = algorithm
        self.d = int(theta_dim)
        self.pack = _SUB // self.d
        self.y_obs = np.broadcast_to(
            np.asarray(y_obs, np.float32).reshape(-1), (self.d,)
        )
        self.eps = float(epsilon)
        self.sigma = float(sigma)
        self.gf = float(global_frequency)
        self.B = int(batch_size)
        self.prior_loc = float(prior_loc)
        self.prior_scale = float(prior_scale)
        self.ip_loc = float(ip_loc)
        self.ip_scale = float(ip_scale)
        self.lp_scale = float(lp_scale)
        self.T = int(steps_per_call)
        self.C_blk = int(block_chains)
        self.collect_history = bool(collect_history)
        self.interpret = bool(interpret)
        assert self.C_blk % 128 == 0

    # ------------------------------------------------------------- kernel
    def _kernel(self, seed_ref, y_obs_ref, theta_ref, y_ref, logk_ref,
                theta_out_ref, y_out_ref, logk_out_ref, hist_ref,
                acc_ref, gatt_ref, gacc_ref, lacc_ref):
        d, pack, gf, B, C = self.d, self.pack, self.gf, self.B, self.C_blk
        eps, sigma = self.eps, self.sigma

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * np.int32(SEED_STRIDE))

        rows = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
        leader = (rows % d == 0).astype(jnp.float32)   # group-leader rows
        # y_obs tiled down the groups: rows [y0..y_{d-1}, y0.., ...]
        y_obs = jnp.zeros((_SUB, 1), jnp.float32)
        for j in range(d):
            y_obs = jnp.where(rows % d == j, y_obs_ref[j], y_obs)

        def group_sum(x):
            """Per-group sum of d consecutive rows, broadcast to all rows of
            the group."""
            s = x
            for j in range(1, d):
                # pltpu.roll requires non-negative shifts; -j == _SUB - j
                s = s + pltpu.roll(x, _SUB - j, axis=0)
            # s's leader rows now hold the group sums
            s = s * leader
            out = s
            for j in range(1, d):
                out = out + pltpu.roll(s, j, axis=0)
            return out

        def group_bcast(x):
            """Broadcast each group's leader-row value to the whole group."""
            s = x * leader
            out = s
            for j in range(1, d):
                out = out + pltpu.roll(s, j, axis=0)
            return out

        # prior_lp(th) - ip_lp(th) collapses to ONE per-row quadratic
        # (the 2pi constants cancel), so the iSIR log-weight needs a single
        # group reduction instead of two.
        ps2 = self.prior_scale ** 2
        is2 = self.ip_scale ** 2
        q2 = 0.5 * (1.0 / is2 - 1.0 / ps2)
        q1 = self.prior_loc / ps2 - self.ip_loc / is2
        q0 = (np.log(self.ip_scale) - np.log(self.prior_scale)
              - 0.5 * self.prior_loc ** 2 / ps2
              + 0.5 * self.ip_loc ** 2 / is2)

        def prior_minus_ip_lp(th):
            return group_sum((q2 * th + q1) * th + q0)

        # prior_lp(a) - prior_lp(b) as one reduction (local MH ratio)
        def prior_diff_lp(a, b):
            za = (a - self.prior_loc)
            zb = (b - self.prior_loc)
            return group_sum((zb * zb - za * za) * (0.5 / ps2))

        def kernel_lp(y):
            diff = y - y_obs
            dis2 = group_sum(diff * diff)
            return (-0.5 * _LOG_2PI - np.log(eps)) - 0.5 * dis2 / (eps * eps)

        def scalar_pool(n, tile_fn):
            """``n`` independent per-packed-chain scalar tiles (values equal
            across each group's rows) from ``ceil(n/d)`` full-tile draws.

            Each group has ``d`` sublane rows but a group-scalar uses only
            the leader row's entropy; extraction ``j`` rotates the tile by
            ``j`` so its leader rows read rows ``{j, d+j, ...}`` — disjoint
            PRNG bits across ``j``.  The transcendental (``tile_fn``) runs
            once per full tile and is amortized over ``d`` scalars."""
            outs = []
            tile = None
            for i in range(n):
                j = i % d
                if j == 0:
                    tile = tile_fn((_SUB, C))
                rolled = tile if j == 0 else pltpu.roll(tile, _SUB - j,
                                                        axis=0)
                outs.append(group_bcast(rolled))
            return outs

        def body(t, state):
            theta, y, logk, acc, gatt, gacc, lacc = state

            if self.algorithm == "glmcmc":
                gum = scalar_pool(B + 1, _gumbel)
                unis = scalar_pool(2, _uniform)

                # ------------ global branch: iSIR streaming Gumbel argmax
                logw_old = prior_minus_ip_lp(theta) + logk
                w_score = logw_old + gum[0]
                w_theta, w_y, w_logk = theta, y, logk
                w_moved = jnp.zeros((_SUB, C), jnp.float32)
                for b in range(B):
                    n1, n2 = _normal_pair((_SUB, C))
                    thp = self.ip_loc + self.ip_scale * n1
                    yp = jnp.abs(thp) + sigma * n2
                    logkp = kernel_lp(yp)
                    logw = prior_minus_ip_lp(thp) + logkp
                    score = logw + gum[b + 1]
                    upd = score > w_score       # group-uniform by construction
                    w_score = jnp.where(upd, score, w_score)
                    w_theta = jnp.where(upd, thp, w_theta)
                    w_y = jnp.where(upd, yp, w_y)
                    w_logk = jnp.where(upd, logkp, w_logk)
                    w_moved = jnp.where(upd, 1.0, w_moved)
            else:
                # ------------ global branch: independence MH
                # log a = (prior-ip)(th') + logK' - (prior-ip)(th) - logK
                # (reference GlobalMCMC.py:44-46, proposal terms folded into
                # the same single quadratic group-sum as the iSIR weights)
                unis = scalar_pool(3, _uniform)
                n1, n2 = _normal_pair((_SUB, C))
                thp = self.ip_loc + self.ip_scale * n1
                yp = jnp.abs(thp) + sigma * n2
                logkp = kernel_lp(yp)
                log_acc = (prior_minus_ip_lp(thp) + logkp
                           - prior_minus_ip_lp(theta) - logk)
                g_acc = jnp.log(unis[2]) < log_acc
                w_theta = jnp.where(g_acc, thp, theta)
                w_y = jnp.where(g_acc, yp, y)
                w_logk = jnp.where(g_acc, logkp, logk)
                w_moved = jnp.where(g_acc, 1.0, 0.0)

            # ---------------- local branch: RW-MH
            n1, n2 = _normal_pair((_SUB, C))
            thl = theta + self.lp_scale * n1
            yl = jnp.abs(thl) + sigma * n2
            logkl = kernel_lp(yl)
            log_acc = prior_diff_lp(thl, theta) + logkl - logk
            l_acc = jnp.log(unis[0]) < log_acc
            l_theta = jnp.where(l_acc, thl, theta)
            l_y = jnp.where(l_acc, yl, y)
            l_logk = jnp.where(l_acc, logkl, logk)

            # ---------------- coin flip (group-uniform)
            is_g = unis[1] < gf
            theta = jnp.where(is_g, w_theta, l_theta)
            y = jnp.where(is_g, w_y, l_y)
            logk = jnp.where(is_g, w_logk, l_logk)
            is_g_f = jnp.where(is_g, 1.0, 0.0)
            moved = jnp.where(is_g, w_moved, jnp.where(l_acc, 1.0, 0.0))
            acc = acc + moved * leader
            gatt = gatt + is_g_f * leader
            gacc = gacc + is_g_f * w_moved * leader
            lacc = lacc + (1.0 - is_g_f) * jnp.where(l_acc, 1.0, 0.0) * leader

            if self.collect_history:
                hist_ref[t] = theta
            return theta, y, logk, acc, gatt, gacc, lacc

        z = jnp.zeros((_SUB, C), jnp.float32)
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
        """``theta``/``y``/``logk``: packed ``(8, C)`` arrays (``logk``
        group-broadcast).  Packed chain count = ``pack * C``."""
        C = theta.shape[-1]
        assert C % self.C_blk == 0
        n_blk = C // self.C_blk
        T = self.T

        spec = pl.BlockSpec((_SUB, self.C_blk), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
        hist_T = T if self.collect_history else 1
        hist_spec = pl.BlockSpec((hist_T, _SUB, self.C_blk),
                                 lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            self._kernel,
            grid=(n_blk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                spec, spec, spec,
            ],
            out_specs=(spec, spec, spec, hist_spec, spec, spec, spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
                jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
                jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
                jax.ShapeDtypeStruct((hist_T, _SUB, C), jnp.float32),
                jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
                jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
                jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
                jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
            ),
            interpret=pltpu.InterpretParams() if self.interpret else False,
        )(jnp.asarray(seed, jnp.int32).reshape(1), jnp.asarray(self.y_obs),
          theta, y, logk)
        theta_n, y_n, logk_n, hist, acc, gatt, gacc, lacc = out
        stats = PackedStats(acc, gatt, gacc, lacc)
        return (theta_n, y_n, logk_n,
                (hist if self.collect_history else None), stats)

    def make_sharded_run(self, mesh):
        """Multi-chip variant of :meth:`run` — see
        :func:`~glabc_tpu.ops.pallas.sharding.make_sharded_kernel_run`.
        Returns ``run(seed, theta, y, logk)`` taking globally-sharded
        ``(8, C)`` arrays (shard with
        ``NamedSharding(mesh, P(None, 'chains'))``)."""
        from .sharding import make_sharded_kernel_run
        return make_sharded_kernel_run(self.run, self.C_blk, 3, 0,
                                       PackedStats, self.collect_history,
                                       mesh)


def packed_state_init(problem, key, theta0, num_cols: int, pack: int,
                      y0=None):
    """Build packed ``(8, num_cols)`` state for ``pack * num_cols`` chains.

    ``y0``: optional initial dataset (reference ``MCMCRunner.py:17``
    ``initial_y``): ``(d,)``/``(1, d)`` broadcasts to all chains, ``(C, d)``
    gives each chain its own; ``None`` simulates per chain from theta0
    (scan-path ``init_chain_carry`` semantics)."""
    d = problem.theta_dim
    assert pack * d == _SUB
    C_total = pack * num_cols
    theta0 = jnp.asarray(theta0, jnp.float32).reshape(-1)
    th_all = jnp.broadcast_to(theta0, (C_total, d))
    if y0 is None:
        keys = jax.random.split(jax.random.fold_in(key, 1), C_total)
        y_all = jax.vmap(problem.simulate)(keys, th_all)      # (pack*C, d)
    else:
        y_all = jnp.asarray(y0, jnp.float32).reshape(-1, problem.y_dim)
        if y_all.shape[0] == 1:
            y_all = jnp.broadcast_to(y_all, (C_total, problem.y_dim))
        assert y_all.shape[0] == C_total
    logk_all = problem.kernel_log_prob(problem.discrepancy(y_all))

    def to_packed(x_cd):  # (pack*C, d) -> (8, C)
        return (x_cd.reshape(pack, num_cols, d)
                .transpose(0, 2, 1)
                .reshape(_SUB, num_cols))

    theta = to_packed(th_all)
    y = to_packed(y_all)
    logk = to_packed(
        jnp.repeat(logk_all[:, None], d, axis=1)
    )
    return theta, y, logk


def unpack_history(hist, d: int):
    """(T, 8, C) packed history -> (pack*C, T, d) chains."""
    T, sub, C = hist.shape
    pack = sub // d
    x = np.asarray(hist).reshape(T, pack, d, C)
    return x.transpose(1, 3, 0, 2).reshape(pack * C, T, d)
