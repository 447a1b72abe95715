"""Pallas TPU kernel: per-chain Gaussian-mixture (KDE) log-density, batched
over chains.

The AGLMCMC adaptation epoch evaluates each chain's freshly drawn pool
(``P`` points) under that chain's weighted KDE (``P`` support components) —
``KernelDensity.log_prob`` vmapped over 10^4-10^5 chains
(reference ``AGLMCMC.py:229`` / ``kernel_density.py:96-128``).  On the XLA
path the matmul-decomposed ``(points, support)`` cross matrix materializes
in HBM per chain (4 MB at P=1000) and the epoch pays ~2x its bytes in
traffic: ~407 ms of the 1.29 s epoch at 32k chains
(``benchmarks/r5_epoch_ablate.py``).  This kernel evaluates the density
entirely in VMEM (points chunked on the sublane axis, the support consumed
whole per chain), so HBM traffic is just the inputs/outputs (~16 KB per
chain) and the cost is the irreducible ``P^2`` density evaluations on the
VPU.

Math (identical to :class:`~glabc_tpu.models.kde.KernelDensity.log_prob`
up to reduction order, and to the mixed kernel's
:class:`~glabc_tpu.ops.pallas.pool_isir_mixed_kernel.ResidentProposal`
per-chain):

    log q_c(x) = logsumexp_i(pre[c,i] + sum_f ms[c,i,f] x_f)
                 - 0.5 sum_f x_f^2 inv2h[c,f]

with ``ms = mu / h^2``, ``pre = log(w + 1e-10) - 0.5 sum mu^2/h^2
- sum log h - (d/2) log 2pi`` (support pads carry ``pre = -1e30``).

Layouts (all lane-major, no d-minor arrays — see CLAUDE.md on the
``T(8,128)`` d=2 lane-padding blowup):

* evaluation points: per-feature planes ``x_t[f] (Np, C)`` (points on
  sublanes, chains on lanes), output ``logq (Np, C)``;
* support: per-feature planes ``ms[f] (C, Pp)``, ``pre (C, Pp)`` (chains on
  sublanes, support slots on lanes), ``inv2h (C, d_pad)``.

Per grid step the kernel holds a 128-chain block of everything in VMEM and
walks the chains with a lane-rotation trick: dynamic *lane* indexing (and
lane-offset slicing/concat) is not lowerable on TPU, so the point/output
tiles are rotated one lane per iteration (``pltpu.roll``) and only lane 0
is ever read (masked lane reduction) / lane ``cb-1`` written (masked
``where``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._hashable import ConfigHashable

__all__ = ["BatchedMixtureLogProb", "batched_kde_log_prob"]

_SUB = 8
_LOG_2PI = float(np.log(2.0 * np.pi))
_NEG = -1.0e30


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class BatchedMixtureLogProb(ConfigHashable):
    """``logq[p, c] = log q_c(x[:, p, c])`` for per-chain mixtures."""

    def __init__(self, dim: int, n_points: int, n_support: int, *,
                 block_chains: int = 128, point_chunk: int = 512,
                 interpret: bool = False):
        self.d = int(dim)
        self.d_pad = max(_SUB, _round_up(self.d, _SUB))
        self.pp = _round_up(int(n_support), 128)
        self.c_blk = int(block_chains)
        assert self.c_blk % 128 == 0
        # VMEM is bounded by blocking the POINT (sublane) axis — a second
        # grid dimension — because the support axis must be consumed whole
        # (lane-offset slicing does not lower).  Auto-size the point block
        # to the ~16 MB scoped-VMEM budget: the d rotated point carries are
        # double-buffered by the fori_loop, the d+1 support planes are
        # resident per 128-chain block (at d=8 the all-points-at-once form
        # is 18.6 MB and fails to compile).
        # model units, not bytes: Mosaic's scoped-VMEM accounting runs
        # ~1.5-2x this estimate (extra fusion temps / triple buffering), so
        # the budget is calibrated against what actually compiles — d=2
        # whole-pool blocks pass, d=8 must shrink to pb<=128
        budget = 9 * 2**20
        sup_bytes = (self.d + 1) * self.c_blk * self.pp * 4
        npd = _round_up(int(n_points), _SUB)
        pb = npd
        while pb > _SUB:
            chunk = max(_SUB, min(_round_up(int(point_chunk), _SUB), pb))
            need = (2 * self.d * pb * self.c_blk * 4 + sup_bytes
                    + 2 * chunk * self.pp * 4 + 2 * pb * self.c_blk * 4)
            if need <= budget:
                break
            pb = _round_up(pb // 2, _SUB)
        self.pb = pb
        self.np_pad = _round_up(npd, pb)
        self.chunk = max(_SUB, min(_round_up(int(point_chunk), _SUB), pb))
        self.interpret = bool(interpret)

    # ------------------------------------------------------------- kernel
    def _kernel(self, *refs):
        d = self.d
        x_refs = refs[:d]
        ms_refs = refs[d:2 * d]
        pre_ref, inv2h_ref, out_ref = refs[2 * d:]
        npd, cb = self.pb, self.c_blk

        lane0 = jax.lax.broadcasted_iota(jnp.int32, (npd, cb), 1) == 0
        lane_last = (jax.lax.broadcasted_iota(jnp.int32, (npd, cb), 1)
                     == cb - 1)

        def _col0(t):
            """Lane 0 of ``t (Np, cb)`` as an ``(Np, 1)`` column — via a
            masked lane reduction (single-lane slices / unaligned lane
            concats do not lower; Mosaic rejects the layout)."""
            return jnp.sum(jnp.where(lane0, t, 0.0), axis=1, keepdims=True)

        def one_chain(c, carry):
            xcs = carry[:d]
            acc = carry[d]
            # chain c's point coords, one (Np, 1) column per feature
            cols = [_col0(t) for t in xcs]
            # FULL support rows: lane-slicing at offsets >= 128 (value or
            # ref) fails Mosaic layout checks under a dynamic-sublane read,
            # so VMEM pressure is bounded by chunking the POINT (sublane)
            # axis instead — sublane value slices lower fine.
            pre_row = pre_ref[pl.ds(c, 1), :]                       # (1, Pp)
            ms_rows = [ms_refs[f][pl.ds(c, 1), :] for f in range(d)]
            q2 = jnp.zeros((npd, 1), jnp.float32)
            for f in range(d):
                iv = inv2h_ref[pl.ds(c, 1), f:f + 1]                # (1, 1)
                q2 = q2 + (cols[f] * cols[f]) * iv
            parts = []
            for p0 in range(0, npd, self.chunk):
                pc = min(self.chunk, npd - p0)
                # cross term as d broadcast outer products on the VPU —
                # an (Np, d) @ (d, Pp) MXU dot needs lane-concat'd
                # operands whose layouts Mosaic rejects, and at d <= 8 the
                # VPU form is within ~2x of the padded-K MXU cost anyway
                lw = jnp.broadcast_to(pre_row, (pc, self.pp))
                for f in range(d):
                    lw = lw + cols[f][p0:p0 + pc, :] * ms_rows[f]
                m = jnp.max(lw, axis=1, keepdims=True)
                s = jnp.sum(jnp.exp(lw - m), axis=1, keepdims=True)
                parts.append(m + jnp.log(s))
            logq = (jnp.concatenate(parts, axis=0) if len(parts) > 1
                    else parts[0]) - 0.5 * q2                       # (Np, 1)
            # rotate point tiles one lane left; deposit this chain's output
            # in the freed last lane — after c_blk iterations column order
            # is restored.  pltpu.roll + masked where: lane-offset slices
            # and unaligned lane concats are not lowerable.
            new_xcs = tuple(pltpu.roll(t, cb - 1, 1) for t in xcs)
            acc = jnp.where(lane_last, logq, pltpu.roll(acc, cb - 1, 1))
            return new_xcs + (acc,)

        init = tuple(r[:] for r in x_refs) + (
            jnp.zeros((npd, cb), jnp.float32),)
        out = jax.lax.fori_loop(0, cb, one_chain, init)
        out_ref[:] = out[d]

    # --------------------------------------------------------------- call
    @functools.partial(jax.jit, static_argnums=(0,))
    def run(self, x_t, ms, pre, inv2h):
        """``x_t``: tuple of ``d`` point planes ``(np_pad, C)``; ``ms``:
        tuple of ``d`` scaled-support planes ``(C, pp)``; ``pre`` ``(C,
        pp)``; ``inv2h`` ``(C, d_pad)``.  Returns ``logq (np_pad, C)``."""
        C = x_t[0].shape[1]
        assert C % self.c_blk == 0
        npd, cb = self.np_pad, self.c_blk

        x_spec = pl.BlockSpec((self.pb, cb), lambda i, j: (j, i),
                              memory_space=pltpu.VMEM)
        sup_spec = pl.BlockSpec((cb, self.pp), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
        iv_spec = pl.BlockSpec((cb, self.d_pad), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            self._kernel,
            grid=(C // cb, npd // self.pb),
            in_specs=[x_spec] * self.d + [sup_spec] * self.d
                     + [sup_spec, iv_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct((npd, C), jnp.float32),
            interpret=pltpu.InterpretParams() if self.interpret else False,
        )(*x_t, *ms, pre, inv2h)
        return out


@functools.lru_cache(maxsize=32)
def _kernel_for(dim, n_points, n_support, block_chains, point_chunk,
                interpret):
    return BatchedMixtureLogProb(dim, n_points, n_support,
                                 block_chains=block_chains,
                                 point_chunk=point_chunk,
                                 interpret=interpret)


def batched_kde_log_prob(kdes, x, *, block_chains: int = 128,
                         point_chunk: int = 512,
                         interpret: bool = False) -> jnp.ndarray:
    """``vmap(lambda kde, pts: kde.log_prob(pts))(kdes, x)`` via the fused
    kernel: ``kdes`` a chain-batched :class:`KernelDensity` (leaves
    ``X (C, P, d)``, ``weights (C, P)``, ``bandwidth (C, d)``), ``x``
    ``(C, N, d)`` -> ``(C, N)``.  Matches the XLA path to ~1e-4 (reduction
    order); support pads carry zero mass exactly."""
    C, P, d = kdes.X.shape
    N = x.shape[1]
    kern = _kernel_for(d, N, P, block_chains, point_chunk, interpret)

    bw = jnp.asarray(kdes.bandwidth, jnp.float32)           # (C, d)
    inv_h2 = 1.0 / (bw * bw)
    const = (-jnp.sum(jnp.log(bw), axis=1)
             - 0.5 * d * _LOG_2PI)                          # (C,)
    mu = jnp.asarray(kdes.X, jnp.float32)
    pre = (jnp.log(kdes.weights + 1e-10) + const[:, None]
           - 0.5 * jnp.sum(mu * mu * inv_h2[:, None, :], axis=-1))  # (C, P)
    pre = jnp.pad(pre, ((0, 0), (0, kern.pp - P)), constant_values=_NEG)
    ms = tuple(
        jnp.pad(mu[:, :, f] * inv_h2[:, f:f + 1],
                ((0, 0), (0, kern.pp - P)))
        for f in range(d))                                   # d x (C, pp)
    inv2h = jnp.pad(inv_h2, ((0, 0), (0, kern.d_pad - d)))   # (C, d_pad)
    x = jnp.asarray(x, jnp.float32)
    x_t = tuple(
        jnp.pad(x[:, :, f].T, ((0, kern.np_pad - N), (0, 0)))
        for f in range(d))                                   # d x (np_pad, C)
    logq = kern.run(x_t, ms, pre, inv2h)                     # (np_pad, C)
    return logq[:N, :].T
