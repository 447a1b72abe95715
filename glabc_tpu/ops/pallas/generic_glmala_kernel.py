"""Generic fused GLMALA kernel: arbitrary TileProgram simulators in the
in-VMEM CRN synthetic-likelihood gradient loop.

:class:`~glabc_tpu.ops.pallas.glmala_kernel.PackedMixtureGLMALA` hardcodes
the Mixture simulator; the reference's gradient estimator is
problem-agnostic — it calls the duck-typed simulator ``2 * theta_dim *
num_grad`` times per proposed local move (``GLMALA.py:46-95``).  This
kernel welds that estimator onto :class:`~glabc_tpu.ops.pallas.generic_kernel.TileProgram`
callables (the MA(2) streaming simulator, the Mixture family, or any user
program), so non-Mixture problems get the fused MALA path instead of the
~37k trans/s scan fallback.

Layout: the generic ``(d_pad=8, C)`` one-chain-per-lane tiles of
:class:`~glabc_tpu.ops.pallas.generic_kernel.GenericFusedGLMCMC` (no
sublane packing — ``y_rows`` may differ from ``theta_dim``), plus a
``(d_pad, C)`` cached-gradient tile carried across steps (the reference's
lazy gradient cache: stale after accepted global moves, ``GLMALA.py:183-199``).

Common random numbers via explicit re-seeding: a TileProgram simulator
draws its own noise from the on-chip PRNG, so the +fd/-fd perturbations of
coordinate ``k`` at replicate ``r`` both run under ``prng_seed(seed(t, r,
k))`` — the same coupling as the scan path's per-coordinate key reuse
(``samplers/glmala.synthetic_likelihood_grad``).  The main per-step stream
is re-seeded around the gradient loop (sub-seeds use a distinct odd
multiplier so they cannot tile onto the per-program ``SEED_STRIDE``
lattice).

Synthetic-likelihood parity (``GLMALA.py:86-94``): per coordinate
``log p = -0.5 log(Var[dis] + eps^2) - 0.5 E[dis]^2 / (Var[dis] + eps^2)``
with the unbiased (ddof=1) variance over ``num_grad`` replicates;
``grad_k = (log p(+fd) - log p(-fd)) / (2 fd)`` plus the program's closed
-form prior gradient (the reference's 1e-5 prior central difference to
machine precision).  MH correction as in the packed kernel: forward =
N(0,1) density of the drawn ``z``; reverse = N(0,1) density of
``(theta - theta' - grad' tau^2/2) / tau``; Jacobian constants cancel.
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
from .generic_kernel import TileLib, TileProgram
from .mixture_kernel import _gumbel, _normal_pair, _uniform
from .sharding import SEED_STRIDE

__all__ = ["GenericFusedGLMALA"]

_LOG_2PI = float(np.log(2.0 * np.pi))
_SUB = 8
# sub-seed multiplier for the in-kernel CRN re-seeds; a different odd
# constant than SEED_STRIDE so (program_id, step, replicate) seeds cannot
# land on another program instance's base seed
_GRAD_STRIDE = np.int32(1234567891)


class GLMALAProgStats(NamedTuple):
    accepted: jnp.ndarray        # (1, C) counts
    global_attempts: jnp.ndarray
    global_accepts: jnp.ndarray
    local_accepts: jnp.ndarray


class GenericFusedGLMALA(ConfigHashable):
    """Fused GLMALA transition loop for an arbitrary :class:`TileProgram`.

    ``run(seed, theta, y, logk, grad)`` advances ``steps_per_call``
    transitions; state tiles ``(d_pad, C)``, ``logk`` ``(1, C)``.  The
    program must define ``discrepancy`` and ``prior_grad``.
    """

    def __init__(self, program: TileProgram, *, epsilon: float,
                 global_frequency: float = 0.8, batch_size: int = 5,
                 tau: float = 0.3, num_grad: int = 100,
                 fd_step: float = 0.1, steps_per_call: int = 16,
                 block_chains: int = 512, collect_history: bool = True,
                 coin_mode: str = "shared", interpret: bool = False):
        assert program.discrepancy is not None, (
            "GenericFusedGLMALA needs TileProgram.discrepancy (the "
            "statistic behind the synthetic likelihood)")
        assert program.prior_grad is not None, (
            "GenericFusedGLMALA needs TileProgram.prior_grad")
        assert coin_mode in ("per_chain", "shared")
        self.p = program
        self.d = int(program.theta_dim)
        self.d_pad = max(_SUB, ((self.d + _SUB - 1) // _SUB) * _SUB)
        assert program.y_rows <= self.d_pad
        self.eps = float(epsilon)
        self.gf = float(global_frequency)
        self.B = int(batch_size)
        self.tau = float(tau)
        self.num_grad = int(num_grad)
        self.fd = float(fd_step)
        self.T = int(steps_per_call)
        self.C_blk = int(block_chains)
        self.collect_history = bool(collect_history)
        self.coin_mode = coin_mode
        self.interpret = bool(interpret)
        assert self.C_blk % 128 == 0

    # ------------------------------------------------------------- kernel
    def _kernel(self, seed_ref, coins_ref, theta_ref, y_ref, logk_ref,
                grad_ref, theta_out_ref, y_out_ref, logk_out_ref,
                grad_out_ref, hist_ref, acc_ref, gatt_ref, gacc_ref,
                lacc_ref):
        p, gf, B, C = self.p, self.gf, self.B, self.C_blk
        d, tau, fd, n_g = self.d, self.tau, self.fd, self.num_grad
        tl = TileLib(self.d_pad, C)
        mask = tl.mask(d)
        log_norm = -0.5 * _LOG_2PI

        base = seed_ref[0] + pl.program_id(0) * np.int32(SEED_STRIDE)
        # seed slots per step: 2 main-stream phases + num_grad*d CRN pairs
        slots = np.int32(n_g * d + 2)

        def std_normal_lp(z):
            return tl.rowsum(log_norm - 0.5 * z * z, d)

        def sl_gradient(th, t):
            """grad log p_ABC(th): CRN central differences of the Gaussian
            synthetic likelihood through the program's simulator, plus the
            program's prior gradient.  Returns a (d_pad, C) tile."""
            rows_eq = [(tl._rows == k).astype(jnp.float32)
                       for k in range(d)]
            grad_rows = []
            for k in range(d):
                ek = (fd * rows_eq[k])

                def rep(r, accs):
                    s1p, s2p, s1m, s2m = accs
                    s_rk = (base + (t * slots + 2 + r * d + k)
                            * _GRAD_STRIDE)
                    pltpu.prng_seed(s_rk)
                    dis_p = p.discrepancy(tl, p.simulate(tl, (th + ek)
                                                         * mask))
                    pltpu.prng_seed(s_rk)           # CRN: same stream for -
                    dis_m = p.discrepancy(tl, p.simulate(tl, (th - ek)
                                                         * mask))
                    return (s1p + dis_p, s2p + dis_p * dis_p,
                            s1m + dis_m, s2m + dis_m * dis_m)

                zero = jnp.zeros((1, C), jnp.float32)
                s1p, s2p, s1m, s2m = jax.lax.fori_loop(
                    0, n_g, rep, (zero, zero, zero, zero))

                def sl_lp(s1, s2):
                    mu = s1 / n_g
                    var = (s2 - n_g * mu * mu) / (n_g - 1)
                    s = var + self.eps * self.eps
                    return -0.5 * jnp.log(s) - 0.5 * mu * mu / s

                grad_rows.append((sl_lp(s1p, s2p) - sl_lp(s1m, s2m))
                                 / (2.0 * fd))
            grad_ll = tl.from_rows(grad_rows)
            return grad_ll + p.prior_grad(tl, th)

        def global_move(theta, y, logk, grad):
            """iSIR streaming Gumbel argmax; gradient stays stale
            (reference lazy cache, GLMALA.py:183-199)."""
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
            return w_theta, w_y, w_logk, grad, w_moved

        def local_move(theta, y, logk, grad, t):
            """ABC-MALA drift proposal + MH with reverse-drift density
            (GLMALA.py:97-116,190-199)."""
            z = tl.normal()
            log_fwd = std_normal_lp(z)
            theta_p = (theta + tau * z + grad * (tau * tau / 2.0)) * mask
            grad_p = sl_gradient(theta_p, t)
            # main stream phase 2 (the gradient loop re-seeded the PRNG)
            pltpu.prng_seed(base + (t * slots + 1) * _GRAD_STRIDE)
            y_p = p.simulate(tl, theta_p)
            logk_p = p.log_kernel(tl, y_p)
            z_rev = (theta - theta_p - grad_p * (tau * tau / 2.0)) / tau
            log_rev = std_normal_lp(z_rev * mask)
            log_acc = (p.prior_diff_lp(tl, theta_p, theta) + logk_p
                       + log_rev - logk - log_fwd)
            l_acc = jnp.log(_uniform((1, C))) < log_acc
            n_theta = jnp.where(l_acc, theta_p, theta)
            n_y = jnp.where(l_acc, y_p, y)
            n_logk = jnp.where(l_acc, logk_p, logk)
            n_grad = jnp.where(l_acc, grad_p, grad)
            return n_theta, n_y, n_logk, n_grad, l_acc.astype(jnp.float32)

        def body(t, state):
            theta, y, logk, grad, acc, gatt, gacc, lacc = state
            # main stream phase 1: coin, gumbels, candidates, drift z
            pltpu.prng_seed(base + (t * slots) * _GRAD_STRIDE)

            if self.coin_mode == "shared":
                is_g_scalar = coins_ref[t] == 1
                theta, y, logk, grad, moved = jax.lax.cond(
                    is_g_scalar,
                    lambda a: global_move(*a[:4]),
                    lambda a: local_move(*a),
                    (theta, y, logk, grad, t))
                is_g_f = jnp.where(is_g_scalar,
                                   jnp.ones((1, C), jnp.float32),
                                   jnp.zeros((1, C), jnp.float32))
            else:
                is_g = _uniform((1, C)) < gf
                g_th, g_y, g_lk, g_gr, g_mv = global_move(theta, y, logk,
                                                          grad)
                l_th, l_y, l_lk, l_gr, l_mv = local_move(theta, y, logk,
                                                         grad, t)
                is_g_f = is_g.astype(jnp.float32)
                theta = jnp.where(is_g, g_th, l_th)
                y = jnp.where(is_g, g_y, l_y)
                logk = jnp.where(is_g, g_lk, l_lk)
                grad = jnp.where(is_g, g_gr, l_gr)
                moved = jnp.where(is_g, g_mv, l_mv)

            acc = acc + moved
            gatt = gatt + is_g_f
            gacc = gacc + is_g_f * moved
            lacc = lacc + (1.0 - is_g_f) * moved
            if self.collect_history:
                hist_ref[t] = theta
            return theta, y, logk, grad, acc, gatt, gacc, lacc

        z = jnp.zeros((1, C), jnp.float32)
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
        """``theta``/``y``/``grad``: ``(d_pad, C)``; ``logk``: ``(1, C)``;
        ``coins``: ``(T,)`` int32 shared per-step coins (ignored in
        ``per_chain`` mode — pass zeros)."""
        C = theta.shape[-1]
        assert C % self.C_blk == 0
        n_blk = C // self.C_blk
        dp, T = self.d_pad, self.T

        state_spec = pl.BlockSpec((dp, self.C_blk), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
        row_spec = pl.BlockSpec((1, self.C_blk), lambda i: (0, i),
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
                pl.BlockSpec(memory_space=pltpu.SMEM),
                state_spec, state_spec, row_spec, state_spec,
            ],
            out_specs=(state_spec, state_spec, row_spec, state_spec,
                       hist_spec, row_spec, row_spec, row_spec, row_spec),
            out_shape=(
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((dp, C), jnp.float32),
                jax.ShapeDtypeStruct((hist_T, dp, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
                jax.ShapeDtypeStruct((1, C), jnp.float32),
            ),
            interpret=pltpu.InterpretParams() if self.interpret else False,
        )(jnp.asarray(seed, jnp.int32).reshape(1),
          jnp.asarray(coins, jnp.int32), theta, y, logk, grad)
        theta_n, y_n, logk_n, grad_n, hist, acc, gatt, gacc, lacc = out
        stats = GLMALAProgStats(acc, gatt, gacc, lacc)
        return (theta_n, y_n, logk_n, grad_n,
                (hist if self.collect_history else None), stats)

    def make_sharded_run(self, mesh):
        """Chain-axis ``shard_map`` variant of :meth:`run`; the shared
        per-step coins are replicated for cross-device coherence."""
        from .sharding import make_sharded_kernel_run
        return make_sharded_kernel_run(self.run, self.C_blk, 4, 1,
                                       GLMALAProgStats,
                                       self.collect_history, mesh)
