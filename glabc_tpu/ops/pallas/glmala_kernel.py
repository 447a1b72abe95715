"""Packed fused GLMALA kernel: in-VMEM CRN synthetic-likelihood gradients.

GLMALA's cost center is the local-move gradient estimator: ``2 * theta_dim *
num_grad`` simulator calls per proposed move (reference ``GLMALA.py:46-95``,
the nested per-row/per-coordinate Python loops).  The scan path
(``glabc_tpu.samplers.glmala``) already batches those into two vmapped
simulator calls; this kernel goes further and fuses the *entire* transition —
iSIR global move, MALA drift proposal, the full finite-difference gradient
batch, and the MH select — into one VMEM-resident Pallas kernel with on-chip
PRNG, using the packed ``(8, C)`` sublane layout of
:class:`~glabc_tpu.ops.pallas.packed_kernel.PackedMixtureGLMCMC`.

Gradient redesign for the VPU:

* **One noise tile per replicate.**  The reference re-seeds torch/numpy with
  the same seed for the +d and -d simulations of each coordinate (common
  random numbers, ``GLMALA.py:73-83``).  Here a single standard-normal tile
  ``z_r`` per replicate serves *both signs and all coordinates* — the +/-
  coupling is identical to the scan path's same-key reuse (so each
  coordinate's central-difference estimator matches it in distribution),
  and sharing across coordinates additionally cuts RNG cost by ``2*d`` at no
  bias (it only correlates the d coordinate estimates of one gradient, which
  affects neither the drift's expectation nor chain correctness).
* **Per-row coordinate accumulators.**  In the packed layout, row ``r``
  belongs to coordinate ``r % d`` of its chain group.  The four running sums
  (sum / sum-of-squares of the discrepancy, for +d and -d) are accumulated
  *into the row of their coordinate*, so after the replicate loop the
  synthetic-likelihood mean/variance — and therefore the finite-difference
  gradient — materialize directly as packed ``(8, C)`` tiles with no
  cross-row shuffling.
* **Synthetic likelihood parity** (``GLMALA.py:86-94``): per coordinate,
  ``log p = -0.5 log(Var[dis] + eps^2) - 0.5 E[dis]^2 / (Var[dis] + eps^2)``
  with the unbiased (ddof=1) variance over ``num_grad`` replicates;
  ``grad_k = (log p(+d) - log p(-d)) / (2 d)`` plus the closed-form Gaussian
  prior gradient ``-(theta - loc) / scale^2`` (the reference's 1e-5 central
  difference, ``GLMALA.py:84-85``, to machine precision).

MH correction parity (``GLMALA.py:97-116,190-193``): forward term = standard
normal log-density of the drawn ``z``; reverse term = standard normal
log-density of ``(theta - theta' - grad' tau^2/2)/tau``; the ``1/tau``
Jacobian constants cancel.  The accepted state carries its gradient forward
(``GLMALA.py:199``); after an accepted global move the gradient stays stale,
matching the reference's lazy cache (``GLMALA.py:183-184``).

Coin modes:

* ``per_chain`` (reference semantics, ``GLMALA.py:150-151``): every chain
  flips its own coin each step; both branches are computed and the result
  masked.  The gradient batch runs every step even though only ``1 - gf`` of
  chains take it.
* ``shared``: one coin per step for the whole tile, precomputed host-side
  from the run key and passed via SMEM so the kernel can ``lax.cond`` the
  expensive local branch away on global steps (~``1/(1-gf)``x fewer gradient
  batches).  Each chain's *marginal* transition kernel is unchanged (the coin
  is still Bernoulli(gf) per step); the only statistical difference is that
  move types are synchronized across chains, which leaves per-chain laws and
  posterior estimates exact but mildly correlates chains within a step.
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

__all__ = ["PackedMixtureGLMALA", "packed_grad_init"]

_LOG_2PI = float(np.log(2.0 * np.pi))
_SUB = 8


class GLMALAStats(NamedTuple):
    accepted: jnp.ndarray        # (8, C), counts on group-leader rows
    global_attempts: jnp.ndarray
    global_accepts: jnp.ndarray
    local_accepts: jnp.ndarray


class PackedMixtureGLMALA(ConfigHashable):
    """Fused GLMALA for Mixture-family problems, ``d in {1, 2, 4, 8}``.

    Simulator ``y = |theta| + sigma z``, Gaussian prior ``N(prior_loc,
    prior_scale^2 I)``, Gaussian importance proposal ``N(ip_loc,
    ip_scale^2 I)``, Euclidean discrepancy to ``y_obs``, Gaussian
    epsilon-kernel — the same family as the fused GLMCMC kernels.
    """

    def __init__(self, theta_dim: int, y_obs, *, epsilon: float,
                 sigma: float, global_frequency: float = 0.8,
                 batch_size: int = 5, tau: float = 0.3, num_grad: int = 100,
                 fd_step: float = 0.1, prior_loc=0.0, prior_scale=1.0,
                 ip_loc=0.0, ip_scale=1.0, steps_per_call: int = 32,
                 block_chains: int = 512, collect_history: bool = True,
                 coin_mode: str = "per_chain", interpret: bool = False):
        assert _SUB % theta_dim == 0, "packed kernel needs d | 8"
        assert coin_mode in ("per_chain", "shared")
        self.d = int(theta_dim)
        self.pack = _SUB // self.d
        self.y_obs = np.broadcast_to(
            np.asarray(y_obs, np.float32).reshape(-1), (self.d,)
        )
        self.eps = float(epsilon)
        self.sigma = float(sigma)
        self.gf = float(global_frequency)
        self.B = int(batch_size)
        self.tau = float(tau)
        self.num_grad = int(num_grad)
        self.fd = float(fd_step)
        self.prior_loc = float(prior_loc)
        self.prior_scale = float(prior_scale)
        self.ip_loc = float(ip_loc)
        self.ip_scale = float(ip_scale)
        self.T = int(steps_per_call)
        self.C_blk = int(block_chains)
        self.collect_history = bool(collect_history)
        self.coin_mode = coin_mode
        self.interpret = bool(interpret)
        assert self.C_blk % 128 == 0

    # ------------------------------------------------------------- kernel
    def _kernel(self, seed_ref, y_obs_ref, coins_ref, theta_ref, y_ref,
                logk_ref, grad_ref, theta_out_ref, y_out_ref, logk_out_ref,
                grad_out_ref, hist_ref, acc_ref, gatt_ref, gacc_ref,
                lacc_ref):
        d, gf, B, C = self.d, self.gf, self.B, self.C_blk
        eps, sigma, tau, fd = self.eps, self.sigma, self.tau, self.fd
        n_g = self.num_grad

        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * np.int32(SEED_STRIDE))

        rows = jax.lax.broadcasted_iota(jnp.int32, (_SUB, 1), 0)
        leader = (rows % d == 0).astype(jnp.float32)
        coord_sel = [(rows % d == k).astype(jnp.float32) for k in range(d)]
        y_obs = jnp.zeros((_SUB, 1), jnp.float32)
        for j in range(d):
            y_obs = jnp.where(rows % d == j, y_obs_ref[j], y_obs)

        def group_sum(x):
            s = x
            for j in range(1, d):
                s = s + pltpu.roll(x, _SUB - j, axis=0)
            s = s * leader
            out = s
            for j in range(1, d):
                out = out + pltpu.roll(s, j, axis=0)
            return out

        def group_bcast(x):
            s = x * leader
            out = s
            for j in range(1, d):
                out = out + pltpu.roll(s, j, axis=0)
            return out

        log_norm = -0.5 * _LOG_2PI

        # prior_lp - ip_lp as one per-row quadratic (2pi constants cancel)
        # and prior_lp(a) - prior_lp(b) as one reduction — see
        # packed_kernel.py for the derivation.
        ps2 = self.prior_scale ** 2
        is2 = self.ip_scale ** 2
        q2 = 0.5 * (1.0 / is2 - 1.0 / ps2)
        q1 = self.prior_loc / ps2 - self.ip_loc / is2
        q0 = (np.log(self.ip_scale) - np.log(self.prior_scale)
              - 0.5 * self.prior_loc ** 2 / ps2
              + 0.5 * self.ip_loc ** 2 / is2)

        def prior_minus_ip_lp(th):
            return group_sum((q2 * th + q1) * th + q0)

        def prior_diff_lp(a, b):
            za = a - self.prior_loc
            zb = b - self.prior_loc
            return group_sum((zb * zb - za * za) * (0.5 / ps2))

        def kernel_lp(y):
            diff = y - y_obs
            dis2 = group_sum(diff * diff)
            return (-0.5 * _LOG_2PI - np.log(eps)) - 0.5 * dis2 / (eps * eps)

        def std_normal_group_lp(z):
            return group_sum(log_norm - 0.5 * z * z)

        def scalar_pool(n, tile_fn):
            """``n`` independent group-scalar tiles from ``ceil(n/d)`` draws
            (see ``packed_kernel.scalar_pool``): extraction ``j`` rotates by
            ``j`` so leader rows read disjoint PRNG rows; the transcendental
            runs once per full tile."""
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

        def sl_gradient(th):
            """grad log p_ABC(th): CRN finite differences of the Gaussian
            synthetic likelihood + closed-form prior gradient.  Returns a
            packed (8, C) gradient tile.  Two replicates per loop iteration
            share one Box-Muller draw (both branches used)."""

            def accum(z_r, accs):
                s1p, s2p, s1m, s2m = accs
                for k in range(d):
                    sel = coord_sel[k]
                    y_p = jnp.abs(th + fd * sel) + z_r
                    dif = y_p - y_obs
                    dis_p = jnp.sqrt(group_sum(dif * dif))
                    s1p = s1p + dis_p * sel
                    s2p = s2p + dis_p * dis_p * sel
                    y_m = jnp.abs(th - fd * sel) + z_r
                    dif = y_m - y_obs
                    dis_m = jnp.sqrt(group_sum(dif * dif))
                    s1m = s1m + dis_m * sel
                    s2m = s2m + dis_m * dis_m * sel
                return s1p, s2p, s1m, s2m

            def rep_body(r, accs):
                z1, z2 = _normal_pair((_SUB, C))
                accs = accum(sigma * z1, accs)
                return accum(sigma * z2, accs)

            zeros = jnp.zeros((_SUB, C), jnp.float32)
            accs = (zeros, zeros, zeros, zeros)
            accs = jax.lax.fori_loop(0, n_g // 2, rep_body, accs)
            if n_g % 2:
                z1, _ = _normal_pair((_SUB, C))
                accs = accum(sigma * z1, accs)
            s1p, s2p, s1m, s2m = accs

            def sl_lp(s1, s2):
                mu = s1 / n_g
                var = (s2 - n_g * mu * mu) / (n_g - 1)
                s = var + eps * eps
                return -0.5 * jnp.log(s) - 0.5 * mu * mu / s

            grad_ll = (sl_lp(s1p, s2p) - sl_lp(s1m, s2m)) / (2.0 * fd)
            prior_g = -(th - self.prior_loc) / (self.prior_scale ** 2)
            return grad_ll + prior_g

        def global_move(theta, y, logk, grad):
            """iSIR with streaming Gumbel argmax; gradient stays stale
            (reference lazy cache, GLMALA.py:183-199)."""
            gum = scalar_pool(B + 1, _gumbel)
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
                upd = score > w_score
                w_score = jnp.where(upd, score, w_score)
                w_theta = jnp.where(upd, thp, w_theta)
                w_y = jnp.where(upd, yp, w_y)
                w_logk = jnp.where(upd, logkp, w_logk)
                w_moved = jnp.where(upd, 1.0, w_moved)
            return w_theta, w_y, w_logk, grad, w_moved

        def local_move(theta, y, logk, grad):
            """ABC-MALA drift proposal + MH with reverse-drift density."""
            z, z_sim = _normal_pair((_SUB, C))
            log_fwd = std_normal_group_lp(z)
            theta_p = z * tau + theta + grad * (tau * tau / 2.0)
            grad_p = sl_gradient(theta_p)
            y_p = jnp.abs(theta_p) + sigma * z_sim
            logk_p = kernel_lp(y_p)
            z_rev = (theta - theta_p - grad_p * (tau * tau / 2.0)) / tau
            log_rev = std_normal_group_lp(z_rev)
            log_acc = (prior_diff_lp(theta_p, theta) + logk_p + log_rev
                       - logk - log_fwd)
            l_acc = jnp.log(scalar_pool(1, _uniform)[0]) < log_acc
            n_theta = jnp.where(l_acc, theta_p, theta)
            n_y = jnp.where(l_acc, y_p, y)
            n_logk = jnp.where(l_acc, logk_p, logk)
            n_grad = jnp.where(l_acc, grad_p, grad)
            moved = jnp.where(l_acc, 1.0, 0.0)
            return n_theta, n_y, n_logk, n_grad, moved

        def body(t, state):
            theta, y, logk, grad, acc, gatt, gacc, lacc = state

            if self.coin_mode == "shared":
                is_g_scalar = coins_ref[t] == 1

                def do_global(args):
                    return global_move(*args)

                def do_local(args):
                    return local_move(*args)

                theta, y, logk, grad, moved = jax.lax.cond(
                    is_g_scalar, do_global, do_local, (theta, y, logk, grad)
                )
                is_g_f = jnp.where(
                    is_g_scalar, jnp.ones((_SUB, C), jnp.float32),
                    jnp.zeros((_SUB, C), jnp.float32),
                )
            else:
                g_th, g_y, g_lk, g_gr, g_mv = global_move(theta, y, logk,
                                                          grad)
                l_th, l_y, l_lk, l_gr, l_mv = local_move(theta, y, logk,
                                                         grad)
                is_g = scalar_pool(1, _uniform)[0] < gf
                is_g_f = jnp.where(is_g, 1.0, 0.0)
                theta = jnp.where(is_g, g_th, l_th)
                y = jnp.where(is_g, g_y, l_y)
                logk = jnp.where(is_g, g_lk, l_lk)
                grad = jnp.where(is_g, g_gr, l_gr)
                moved = jnp.where(is_g, g_mv, l_mv)

            acc = acc + moved * leader
            gatt = gatt + is_g_f * leader
            gacc = gacc + is_g_f * moved * leader
            lacc = lacc + (1.0 - is_g_f) * moved * leader

            if self.collect_history:
                hist_ref[t] = theta
            return theta, y, logk, grad, acc, gatt, gacc, lacc

        z = jnp.zeros((_SUB, C), jnp.float32)
        theta, y, logk, grad, acc, gatt, gacc, lacc = jax.lax.fori_loop(
            0, self.T, body,
            (theta_ref[:], y_ref[:], logk_ref[:], grad_ref[:], z, z, z, z),
        )
        theta_out_ref[:] = theta
        y_out_ref[:] = y
        logk_out_ref[:] = logk
        grad_out_ref[:] = grad
        acc_ref[:] = acc
        gatt_ref[:] = gatt
        gacc_ref[:] = gacc
        lacc_ref[:] = lacc

    # --------------------------------------------------------------- call
    @functools.partial(jax.jit, static_argnums=(0,))
    def run(self, seed, coins, theta, y, logk, grad):
        """Run ``steps_per_call`` fused GLMALA transitions.

        ``theta``/``y``/``grad``: packed ``(8, C)``; ``logk``: ``(8, C)``
        group-broadcast.  ``coins``: ``(T,)`` int32 per-step shared coins
        (ignored in ``per_chain`` mode, but must be passed — use zeros).
        """
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
                pl.BlockSpec(memory_space=pltpu.SMEM),
                spec, spec, spec, spec,
            ],
            out_specs=(spec, spec, spec, spec, hist_spec,
                       spec, spec, spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct((_SUB, C), jnp.float32),
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
          jnp.asarray(coins, jnp.int32), theta, y, logk, grad)
        theta_n, y_n, logk_n, grad_n, hist, acc, gatt, gacc, lacc = out
        stats = GLMALAStats(acc, gatt, gacc, lacc)
        return (theta_n, y_n, logk_n, grad_n,
                (hist if self.collect_history else None), stats)

    def make_sharded_run(self, mesh):
        """Multi-chip variant of :meth:`run` — see
        :func:`~glabc_tpu.ops.pallas.sharding.make_sharded_kernel_run`.
        The per-step ``coins`` vector is replicated so shared-coin mode
        stays globally coherent across devices.  Returns
        ``run(seed, coins, theta, y, logk, grad)`` taking globally-sharded
        ``(8, C)`` arrays."""
        from .sharding import make_sharded_kernel_run
        return make_sharded_kernel_run(self.run, self.C_blk, 4, 1,
                                       GLMALAStats, self.collect_history,
                                       mesh)


def packed_grad_init(problem, key, theta0, num_cols: int, pack: int,
                     num_grad: int, fd_step: float = 0.1):
    """Initial packed ``(8, num_cols)`` gradient tile: the scan path's
    CRN finite-difference estimator at theta0, per chain (matches the
    reference's lazy first-use initialization, ``GLMALA.py:183-184``)."""
    from ...samplers.glmala import synthetic_likelihood_grad

    d = problem.theta_dim
    assert pack * d == _SUB
    C_total = pack * num_cols
    theta0 = jnp.asarray(theta0, jnp.float32).reshape(-1)
    th_all = jnp.broadcast_to(theta0, (C_total, d))
    keys = jax.random.split(jax.random.fold_in(key, 2), C_total)
    grads = jax.vmap(
        lambda k, t: synthetic_likelihood_grad(problem, k, t, num_grad,
                                               fd_step)
    )(keys, th_all)  # (pack*C, d)
    return (grads.reshape(pack, num_cols, d)
            .transpose(0, 2, 1)
            .reshape(_SUB, num_cols))
