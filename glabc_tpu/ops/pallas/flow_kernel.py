"""Pallas TPU kernel: fused affine-coupling-flow transform (all layers).

The GLMCMC-NF sampler's throughput is bound by coupling-MLP FLOPs/bytes:
every epoch pushes ``C * step_size * batch_size`` (~10^7-10^8) rows through
the 32-layer flow (reference hot loop ``GLMCMC_NFs.py:70-140``), and every
pooled-path step pulls all ``C`` current states back through it (``:98``).
On the XLA path each layer's ``(hidden, N)`` activation round-trips HBM
(~48 KB/row over 32 layers — ~2 s/epoch of pure HBM traffic at 32M rows),
because a 512 MB activation cannot live in a fusion.

This kernel runs the ENTIRE stack of layers per grid step with everything
resident in VMEM:

* all stacked weights (pre-transposed on the XLA side so each conditioner
  matmul is a direct ``(H, K) @ (K, N)`` MXU dot) — ~2.3 MB at the
  reference's 32x128 architecture, loaded once and revisited across the
  whole grid (constant ``index_map``);
* the running ``(d_pad, N_blk)`` coordinate tile and the ``(H, N_blk)``
  activations as ``fori_loop`` carries/temps — never touching HBM.

HBM traffic drops to the ``z``/``x`` tiles themselves (~64 B/row): the
transform becomes compute-bound.  ``matmul_dtype='bfloat16'`` additionally
runs the ``(H, H)`` dots at the MXU's native bf16 rate with float32
accumulation (the affine/exp epilogue and the log-det sum stay float32);
the log-density error is ~1e-2 absolute — fine for proposal densities
(they only steer iSIR weights), NOT for the training path, which stays on
the differentiable XLA flow anyway (Pallas kernels have no VJP here).

Batch is on lanes, features on sublanes — the same ``(d_pad, C)`` layout as
every other fused kernel in this package, so the NF drivers pass state
tiles straight through with zero relayouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._hashable import ConfigHashable

__all__ = ["FusedCouplingFlow", "flow_push_fused", "flow_pull_fused",
           "pack_flow_weights"]

_SUB = 8


def pack_flow_weights(stack, matmul_dtype=jnp.float32):
    """CouplingFlow ``_CouplingStack`` -> kernel weight layout.

    Returns ``(w0t (L, H, d1_pad), b0 (L, H, 1), w1t (L, H, H),
    b1 (L, H, 1), w2t (L, ts_pad, H), b2 (L, ts_pad, 1))`` with every
    matmul operand pre-transposed (contract the stored leading axis) and
    the tiny feature dims padded to the float32 sublane tile."""
    L, d1, H = stack.w0.shape
    ts = stack.w2.shape[-1]  # 2 * d2
    d1_pad = max(_SUB, ((d1 + _SUB - 1) // _SUB) * _SUB)
    ts_pad = max(_SUB, ((ts + _SUB - 1) // _SUB) * _SUB)
    w0t = jnp.pad(jnp.transpose(stack.w0, (0, 2, 1)),
                  ((0, 0), (0, 0), (0, d1_pad - d1)))
    w1t = jnp.transpose(stack.w1, (0, 2, 1))
    w2t = jnp.pad(jnp.transpose(stack.w2, (0, 2, 1)),
                  ((0, 0), (0, ts_pad - ts), (0, 0)))
    b2 = jnp.pad(stack.b2, ((0, 0), (0, ts_pad - ts)))
    mm = matmul_dtype
    return (w0t.astype(mm), stack.b0[..., None],
            w1t.astype(mm), stack.b1[..., None],
            w2t.astype(mm), b2[..., None])


class FusedCouplingFlow(ConfigHashable):
    """Whole-stack coupling-flow transform as one Pallas kernel.

    ``push``: base -> data over all layers (``CouplingFlow.push_t``);
    ``pull``: data -> base (``CouplingFlow.pull_t``).  Both take/return the
    feature-major ``(d_pad, N)`` tile plus the summed log-scale ``(1, N)``.
    """

    def __init__(self, dim: int, n_layers: int, hidden: int, *,
                 block_rows: int = 2048, matmul_dtype: str = "float32",
                 interpret: bool = False):
        self.d = int(dim)
        self.d2 = self.d // 2
        self.d1 = self.d - self.d2
        assert self.d2 >= 1, "coupling flow needs dim >= 2"
        self.d_pad = max(_SUB, ((self.d + _SUB - 1) // _SUB) * _SUB)
        self.d1_pad = max(_SUB, ((self.d1 + _SUB - 1) // _SUB) * _SUB)
        ts = 2 * self.d2
        self.ts_pad = max(_SUB, ((ts + _SUB - 1) // _SUB) * _SUB)
        self.L = int(n_layers)
        self.H = int(hidden)
        self.N_blk = int(block_rows)
        assert self.N_blk % 128 == 0
        self.mm = jnp.bfloat16 if matmul_dtype == "bfloat16" else jnp.float32
        self.matmul_dtype = matmul_dtype
        self.interpret = bool(interpret)

    # ------------------------------------------------------------- kernels
    def _layer(self, refs, l, u, inverse: bool):
        """One coupling block on the (d_pad, N_blk) tile ``u``; returns
        ``(new_u, s_sum (1, N))``."""
        w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref, b2_ref = refs
        d1, d2, H = self.d1, self.d2, self.H
        mm = self.mm

        if inverse:
            # v = [v2 (d2); u1 (d1)] -> u-layout [u1; v2]
            u1 = u[d2:d2 + d1, :]
            u2 = u[0:d2, :]
        else:
            u1 = u[0:d1, :]
            u2 = u[d1:d1 + d2, :]

        # pad d1 -> d1_pad via concatenate: .at[].set lowers to scatter,
        # which Mosaic does not implement inside kernels
        u1p = u1.astype(mm)
        if self.d1_pad > d1:
            u1p = jnp.concatenate(
                [u1p, jnp.zeros((self.d1_pad - d1, u.shape[1]), mm)], axis=0)
        h = jnp.dot(w0t_ref[l], u1p,
                    preferred_element_type=jnp.float32) + b0_ref[l]
        h = jnp.maximum(h, 0.0)
        h = jnp.dot(w1t_ref[l], h.astype(mm),
                    preferred_element_type=jnp.float32) + b1_ref[l]
        h = jnp.maximum(h, 0.0)
        ts = jnp.dot(w2t_ref[l], h.astype(mm),
                     preferred_element_type=jnp.float32) + b2_ref[l]
        t = ts[0:d2, :]
        s = ts[d2:2 * d2, :]
        if inverse:
            v2 = (u2 - t) * jnp.exp(-s)
            # u-layout [u1; u2]
            out = jnp.concatenate([u1, v2], axis=0)
        else:
            v2 = u2 * jnp.exp(s) + t
            # rolled layout [v2; u1]
            out = jnp.concatenate([v2, u1], axis=0)
        pad = self.d_pad - self.d
        if pad:
            out = jnp.concatenate(
                [out, jnp.zeros((pad, u.shape[1]), jnp.float32)], axis=0)
        s_sum = jnp.sum(s, axis=0, keepdims=True)
        return out, s_sum

    def _push_kernel(self, w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref,
                     b2_ref, z_ref, x_ref, s_ref):
        refs = (w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref, b2_ref)

        def body(l, carry):
            u, acc = carry
            u, s_sum = self._layer(refs, l, u, inverse=False)
            return u, acc + s_sum

        u0 = z_ref[:]
        acc0 = jnp.zeros((1, u0.shape[1]), jnp.float32)
        u, acc = jax.lax.fori_loop(0, self.L, body, (u0, acc0))
        x_ref[:] = u
        s_ref[:] = acc

    def _pull_kernel(self, w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref,
                     b2_ref, x_ref, z_ref, s_ref):
        refs = (w0t_ref, b0_ref, w1t_ref, b1_ref, w2t_ref, b2_ref)
        L = self.L

        def body(i, carry):
            v, acc = carry
            # reverse layer order; _layer(inverse) consumes the rolled
            # [v2; u1] layout directly (== roll(v, -d2) then split)
            u, s_sum = self._layer(refs, L - 1 - i, v, inverse=True)
            return u, acc + s_sum

        v0 = x_ref[:]
        acc0 = jnp.zeros((1, v0.shape[1]), jnp.float32)
        z, acc = jax.lax.fori_loop(0, L, body, (v0, acc0))
        z_ref[:] = z
        s_ref[:] = acc

    # --------------------------------------------------------------- calls
    def _call(self, kernel, packed, tile):
        N = tile.shape[-1]
        assert N % self.N_blk == 0, (
            f"rows ({N}) must divide by block_rows ({self.N_blk})")
        n_blk = N // self.N_blk
        L, H = self.L, self.H

        def const(shape):
            nd = len(shape)
            return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                                memory_space=pltpu.VMEM)

        w_specs = [
            const((L, H, self.d1_pad)), const((L, H, 1)),
            const((L, H, H)), const((L, H, 1)),
            const((L, self.ts_pad, H)), const((L, self.ts_pad, 1)),
        ]
        tile_spec = pl.BlockSpec((self.d_pad, self.N_blk),
                                 lambda i: (0, i), memory_space=pltpu.VMEM)
        row_spec = pl.BlockSpec((1, self.N_blk), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        out, s = pl.pallas_call(
            kernel,
            grid=(n_blk,),
            in_specs=w_specs + [tile_spec],
            out_specs=(tile_spec, row_spec),
            out_shape=(
                jax.ShapeDtypeStruct((self.d_pad, N), jnp.float32),
                jax.ShapeDtypeStruct((1, N), jnp.float32),
            ),
            interpret=pltpu.InterpretParams() if self.interpret else False,
        )(*packed, tile)
        return out, s

    @functools.partial(jax.jit, static_argnums=(0,))
    def push(self, packed, z_t):
        """base -> data: ``z_t (d_pad, N)`` -> ``(x_t (d_pad, N),
        sum log s (1, N))``.  ``packed`` from :func:`pack_flow_weights`."""
        return self._call(self._push_kernel, packed, z_t)

    @functools.partial(jax.jit, static_argnums=(0,))
    def pull(self, packed, x_t):
        """data -> base: ``x_t (d_pad, N)`` -> ``(z_t, sum log s (1, N))``."""
        return self._call(self._pull_kernel, packed, x_t)


@functools.lru_cache(maxsize=32)
def _kernel_for(dim: int, n_layers: int, hidden: int, block_rows: int,
                matmul_dtype: str, interpret: bool) -> FusedCouplingFlow:
    return FusedCouplingFlow(dim, n_layers, hidden, block_rows=block_rows,
                             matmul_dtype=matmul_dtype, interpret=interpret)


def _pad_rows(x_t, d_pad):
    d, n = x_t.shape
    if d == d_pad:
        return x_t
    return jnp.zeros((d_pad, n), jnp.float32).at[:d].set(x_t)


def flow_push_fused(flow, z_t, *, block_rows: int = 2048,
                    matmul_dtype: str = "float32",
                    interpret: bool = False):
    """Kernel-fused ``CouplingFlow.push_t``: ``z_t (dim, N)`` ->
    ``(x_t (dim, N), sum log s (N,))``.  N must divide by ``block_rows``
    (drivers pad/chunk; see ``samplers/glmcmc_nf_fused.py``)."""
    d = flow.dim
    kern = _kernel_for(d, flow.n_layers, flow.stack.w1.shape[-1], block_rows,
                       matmul_dtype, interpret)
    packed = pack_flow_weights(flow.stack, kern.mm)
    x_t, s = kern.push(packed, _pad_rows(jnp.asarray(z_t, jnp.float32),
                                         kern.d_pad))
    return x_t[:d], s[0]


def flow_pull_fused(flow, x_t, *, block_rows: int = 2048,
                    matmul_dtype: str = "float32",
                    interpret: bool = False):
    """Kernel-fused ``CouplingFlow.pull_t`` (the ``log_prob`` core)."""
    d = flow.dim
    kern = _kernel_for(d, flow.n_layers, flow.stack.w1.shape[-1], block_rows,
                       matmul_dtype, interpret)
    packed = pack_flow_weights(flow.stack, kern.mm)
    z_t, s = kern.pull(packed, _pad_rows(jnp.asarray(x_t, jnp.float32),
                                         kern.d_pad))
    return z_t[:d], s[0]
