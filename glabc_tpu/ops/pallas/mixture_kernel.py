"""Pallas TPU kernel: fused GLMCMC transition loop for Mixture-class problems.

This is the speed-of-light path demanded by the driver north star (>= 1e6
transitions/s/chip): the entire per-iteration body of the reference hot loop
(``GLMCMC.py:58-104`` — propose -> simulate -> discrepancy -> epsilon-kernel
-> iSIR/MH select) fused into a single VMEM-resident kernel that runs
``steps_per_call`` transitions per launch with on-chip PRNG, eliminating both
HBM round-trips between ops and the per-step dispatch overhead of the scan
path (~30M trans/s on v5e; this kernel targets the VPU roofline).

Scope: problems of the Mixture family (``examples/Mixture.py:5-53``
generalized to d dims): simulator ``y = |theta| + sigma * z``, Gaussian
prior/proposals, Euclidean discrepancy to ``y_obs``, Gaussian epsilon-kernel.
Arbitrary user problems take the XLA-fused ``lax.scan`` path
(``glabc_tpu.samplers``) — same Markov kernel, compiler-fused.

Layout: chain state is ``(d_pad, C)`` — event dimension on sublanes (padded
to 8), chains on lanes (C a multiple of 128).  The iSIR argmax over the
B+1 candidates (Gumbel-max, ``glabc_tpu.ops.resampling``) is computed as a
streaming running-max over candidates, so no ``(B+1, ...)`` buffer is ever
materialized.
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

__all__ = ["FusedMixtureGLMCMC", "FusedStats", "fused_state_init"]

_LOG_2PI = float(np.log(2.0 * np.pi))
_SUB = 8  # float32 sublane tile


class FusedStats(NamedTuple):
    """Per-chain move statistics accumulated inside the kernel, all (1, C)
    float32: total accepted moves, global-move attempts/accepts, and
    local-move accepts (local attempts = steps - global attempts)."""

    accepted: jnp.ndarray
    global_attempts: jnp.ndarray
    global_accepts: jnp.ndarray
    local_accepts: jnp.ndarray


def _uniform(shape):
    """U(0,1) from raw PRNG bits, strictly inside (0, 1)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # take the top 24 bits -> [0, 1) with 2^-24 resolution, then offset.
    # Mosaic has no uint32->f32 cast; bits>>8 < 2^24 so the int32 view is
    # value-identical.
    hi = pltpu.bitcast(bits >> 8, jnp.int32)
    u = hi.astype(jnp.float32) * (1.0 / (1 << 24))
    return u + (0.5 / (1 << 24))


def _normal(shape):
    """Standard normals via Box-Muller on two uniform draws."""
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * np.pi) * u2)


def _normal_pair(shape):
    """TWO independent standard-normal tiles from ONE Box-Muller draw.

    ``r cos(a)`` and ``r sin(a)`` are exactly independent N(0,1) — using
    both branches halves the PRNG draws and the log/sqrt transcendentals
    versus two ``_normal`` calls.  Use wherever a step consumes noise tiles
    in pairs (proposal noise + simulator noise)."""
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    a = (2.0 * np.pi) * u2
    return r * jnp.cos(a), r * jnp.sin(a)


def _gumbel(shape):
    return -jnp.log(-jnp.log(_uniform(shape)))


class FusedMixtureGLMCMC(ConfigHashable):
    """Fused GLMCMC sampler for the (generalized) Mixture problem.

    Parameters mirror the scan-path sampler: Gaussian prior
    ``N(prior_loc, prior_scale^2 I)``, importance proposal
    ``N(ip_loc, ip_scale^2 I)``, local RW scale ``lp_scale``, simulator noise
    ``sigma``, kernel width ``epsilon``, coin probability
    ``global_frequency``, iSIR batch ``batch_size``.
    """

    def __init__(self, theta_dim: int, y_obs, *, epsilon: float,
                 sigma: float, global_frequency: float = 0.9,
                 batch_size: int = 5, prior_loc=0.0, prior_scale=1.0,
                 ip_loc=0.0, ip_scale=1.0, lp_scale=0.35,
                 steps_per_call: int = 256, block_chains: int = 512,
                 collect_history: bool = True, interpret: bool = False,
                 algorithm: str = "glmcmc"):
        """``algorithm``: 'glmcmc' (iSIR global move, ``GLMCMC.py:66-89``) or
        'global' (independence-MH global move, ``GlobalMCMC.py:39-53``)."""
        assert algorithm in ("glmcmc", "global")
        self.algorithm = algorithm
        self.d = int(theta_dim)
        self.d_pad = max(_SUB, ((self.d + _SUB - 1) // _SUB) * _SUB)
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

        # padded y_obs / event mask as (d_pad, 1) constants baked into the
        # kernel (rows >= d are masked out of every reduction)
        yo = np.zeros((self.d_pad, 1), np.float32)
        yo[: self.d, 0] = self.y_obs
        self._y_obs_pad = yo
        mask = np.zeros((self.d_pad, 1), np.float32)
        mask[: self.d, 0] = 1.0
        self._mask = mask

    # ------------------------------------------------------------- kernel
    def _kernel(self, seed_ref, y_obs_ref, theta_ref, y_ref, logk_ref,
                theta_out_ref, y_out_ref, logk_out_ref, hist_ref,
                acc_ref, gatt_ref, gacc_ref, lacc_ref):
        d, gf, B = self.d, self.gf, self.B
        eps, sigma = self.eps, self.sigma
        C = self.C_blk

        # event-row mask and padded y_obs column, built in-kernel (Pallas
        # forbids captured array constants)
        rows = jax.lax.broadcasted_iota(jnp.int32, (self.d_pad, 1), 0)
        mask = (rows < d).astype(jnp.float32)
        y_obs = jnp.zeros((self.d_pad, 1), jnp.float32)
        for j in range(d):
            y_obs = jnp.where(rows == j, y_obs_ref[j], y_obs)

        # distinct stream per grid program (golden-ratio hash of program id)
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * np.int32(SEED_STRIDE))

        log_norm_const = -0.5 * _LOG_2PI  # per-dim Gaussian constant

        def prior_lp(th):
            # sum over event rows of log N(th; prior_loc, prior_scale)
            z = (th - self.prior_loc) / self.prior_scale
            per = (log_norm_const - np.log(self.prior_scale)
                   - 0.5 * z * z) * mask
            return jnp.sum(per, axis=0, keepdims=True)

        def ip_lp(th):
            z = (th - self.ip_loc) / self.ip_scale
            per = (log_norm_const - np.log(self.ip_scale) - 0.5 * z * z) * mask
            return jnp.sum(per, axis=0, keepdims=True)

        def kernel_lp(y):
            diff = (y - y_obs) * mask
            dis2 = jnp.sum(diff * diff, axis=0, keepdims=True)
            return (-0.5 * _LOG_2PI - np.log(eps)) - 0.5 * dis2 / (eps * eps)

        def body(t, state):
            theta, y, logk, acc, gatt, gacc, lacc = state

            if self.algorithm == "glmcmc":
                # ------------ global branch: iSIR with streaming argmax
                logw_old = prior_lp(theta) + logk - ip_lp(theta)
                w_score = logw_old + _gumbel((1, C))
                w_theta, w_y, w_logk = theta, y, logk
                w_moved = jnp.zeros((1, C), jnp.float32)
                for _ in range(B):
                    n1, n2 = _normal_pair((self.d_pad, C))
                    thp = (self.ip_loc + self.ip_scale * n1) * mask
                    yp = (jnp.abs(thp) + sigma * n2) * mask
                    logkp = kernel_lp(yp)
                    logw = prior_lp(thp) + logkp - ip_lp(thp)
                    score = logw + _gumbel((1, C))
                    upd = score > w_score
                    w_score = jnp.where(upd, score, w_score)
                    w_theta = jnp.where(upd, thp, w_theta)
                    w_y = jnp.where(upd, yp, w_y)
                    w_logk = jnp.where(upd, logkp, w_logk)
                    w_moved = jnp.where(upd, 1.0, w_moved)
            else:
                # ------------ global branch: independence MH
                n1, n2 = _normal_pair((self.d_pad, C))
                thp = (self.ip_loc + self.ip_scale * n1) * mask
                yp = (jnp.abs(thp) + sigma * n2) * mask
                logkp = kernel_lp(yp)
                log_acc = (prior_lp(thp) + logkp + ip_lp(theta)
                           - ip_lp(thp) - prior_lp(theta) - logk)
                g_acc = jnp.log(_uniform((1, C))) < log_acc
                w_theta = jnp.where(g_acc, thp, theta)
                w_y = jnp.where(g_acc, yp, y)
                w_logk = jnp.where(g_acc, logkp, logk)
                w_moved = jnp.where(g_acc, 1.0, 0.0)

            # ---------------- local branch: random-walk MH
            n1, n2 = _normal_pair((self.d_pad, C))
            thl = (theta + self.lp_scale * n1) * mask
            yl = (jnp.abs(thl) + sigma * n2) * mask
            logkl = kernel_lp(yl)
            log_acc = prior_lp(thl) + logkl - prior_lp(theta) - logk
            l_acc = jnp.log(_uniform((1, C))) < log_acc
            l_theta = jnp.where(l_acc, thl, theta)
            l_y = jnp.where(l_acc, yl, y)
            l_logk = jnp.where(l_acc, logkl, logk)

            # ---------------- coin flip
            is_g = _uniform((1, C)) < gf
            theta = jnp.where(is_g, w_theta, l_theta)
            y = jnp.where(is_g, w_y, l_y)
            logk = jnp.where(is_g, w_logk, l_logk)
            moved = jnp.where(is_g, w_moved,
                              jnp.where(l_acc, 1.0, 0.0))
            acc = acc + moved
            is_g_f = is_g.astype(jnp.float32)
            gatt = gatt + is_g_f
            gacc = gacc + is_g_f * w_moved
            lacc = lacc + (1.0 - is_g_f) * jnp.where(l_acc, 1.0, 0.0)

            if self.collect_history:
                hist_ref[t] = theta
            return theta, y, logk, acc, gatt, gacc, lacc

        theta0 = theta_ref[:]
        y0 = y_ref[:]
        logk0 = logk_ref[:]
        z = jnp.zeros((1, C), jnp.float32)
        theta, y, logk, acc, gatt, gacc, lacc = jax.lax.fori_loop(
            0, self.T, body, (theta0, y0, logk0, z, z, z, z)
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
        """Run ``steps_per_call`` fused transitions.

        Args: ``seed`` int32 scalar; ``theta``/``y`` of shape ``(d_pad, C)``;
        ``logk`` ``(1, C)``.  Returns
        ``(theta, y, logk, history (T, d_pad, C) or None, accepted (1, C))``.
        """
        C = theta.shape[-1]
        assert C % self.C_blk == 0
        n_blk = C // self.C_blk
        dp = self.d_pad
        T = self.T

        grid = (n_blk,)
        state_spec = pl.BlockSpec(
            (dp, self.C_blk), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        logk_spec = pl.BlockSpec(
            (1, self.C_blk), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        hist_spec = pl.BlockSpec(
            (T, dp, self.C_blk), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )
        hist_shape = jax.ShapeDtypeStruct(
            (T if self.collect_history else 1, dp, C), jnp.float32
        )
        if not self.collect_history:
            hist_spec = pl.BlockSpec(
                (1, dp, self.C_blk), lambda i: (0, 0, i),
                memory_space=pltpu.VMEM,
            )

        out = pl.pallas_call(
            self._kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                state_spec, state_spec, logk_spec,
            ],
            out_specs=(state_spec, state_spec, logk_spec, hist_spec,
                       logk_spec, logk_spec, logk_spec, logk_spec),
            out_shape=(
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                hist_shape,
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ),
            # TPU interpreter (not the generic one): pltpu.prng_* must work
            interpret=pltpu.InterpretParams() if self.interpret else False,
        )(jnp.asarray([seed], jnp.int32), jnp.asarray(self.y_obs), theta, y,
          logk)
        theta_n, y_n, logk_n, hist, acc, gatt, gacc, lacc = out
        stats = FusedStats(accepted=acc, global_attempts=gatt,
                           global_accepts=gacc, local_accepts=lacc)
        return (theta_n, y_n, logk_n,
                (hist if self.collect_history else None), stats)


def fused_state_init(problem, key, theta0, num_chains: int, d_pad: int = _SUB,
                     y0=None):
    """Build the ``(d_pad, C)`` padded initial state for the fused kernel
    from a problem + theta0, matching the scan-path initialization.

    ``y0``: optional initial dataset (reference ``MCMCRunner.py:17``
    ``initial_y``): ``(d,)``/``(1, d)`` broadcasts to all chains, ``(C, d)``
    per chain; ``None`` simulates per chain from theta0."""
    d = problem.theta_dim
    theta0 = jnp.asarray(theta0, jnp.float32).reshape(-1)
    k_sim = jax.random.fold_in(key, 1)
    theta = jnp.zeros((d_pad, num_chains), jnp.float32)
    theta = theta.at[:d, :].set(theta0[:, None])
    if y0 is None:
        y0 = jax.vmap(problem.simulate)(
            jax.random.split(k_sim, num_chains),
            jnp.broadcast_to(theta0, (num_chains, d)),
        )  # (C, d)
    else:
        y0 = jnp.asarray(y0, jnp.float32).reshape(-1, problem.y_dim)
        if y0.shape[0] == 1:
            y0 = jnp.broadcast_to(y0, (num_chains, problem.y_dim))
        assert y0.shape[0] == num_chains
    y = jnp.zeros((d_pad, num_chains), jnp.float32)
    y = y.at[:d, :].set(y0.T)
    logk = problem.kernel_log_prob(problem.discrepancy(y0))[None, :]
    return theta, y, logk
