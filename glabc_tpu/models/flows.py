"""Dimension-generic affine coupling (RealNVP-style) normalizing flow.

Capability parity with the flow the reference hardwires inside its NF
sampler (``GLMCMC_NFs.py:51-63``: 32 x [AffineCouplingBlock(MLP
[1,128,128,2], init_zeros) + Permute('swap')] over a caller-supplied base,
Adam lr 5e-4 / weight-decay 1e-5).  The reference architecture only works
for theta_dim == 2 (SURVEY quirk 7); this one is generic in ``dim``:

* conditioner MLP ``[d1, hidden, hidden, 2*d2]`` with zero-initialized last
  layer (identity flow at init, matching ``init_zeros=True``);
* each block transforms the last ``d2 = dim // 2`` coordinates conditioned
  on the first ``d1 = dim - d2`` and then rolls the coordinates by ``d2``
  (== the reference's half-swap for even dims, and well-defined for odd);
* all ``n_layers`` blocks have identical parameter shapes and are *stacked*
  (leading layer axis) so both directions run as a single ``lax.scan`` over
  layers — one compiled layer body instead of 32 unrolled ones, and the
  conditioner matmuls land on the MXU.

TPU layout: the layer bodies run **feature-major** — activations are
``(d, N)`` / ``(hidden, N)`` with the batch on the lane (minor) dimension.
In the naive ``(N, d)`` layout every per-layer temp with ``d == 2``
minor-most lane-pads 2 -> 128 (64x HBM traffic; see CLAUDE.md layout
hazards) and the coupling split/concat/roll are lane-dim relayouts; here
they are sublane ops on fully-packed ``(hidden, N)`` tiles and the
conditioner core runs as ``(H, H) @ (H, N)`` MXU matmuls.  The public API
still speaks ``(N, d)`` (one transpose at entry/exit); drivers that hold
packed ``(d_pad, C)`` state can call the ``*_t`` variants and skip even
that.

The flow is a frozen pytree: it lives in a scan carry, is trained with
optax, replicated across a device mesh, and its gradients can be psum'd for
data-parallel training (see ``glabc_tpu.samplers.glmcmc_nf``).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from .distributions import DiagGaussian

__all__ = ["CouplingFlow"]


@dataclasses.dataclass(frozen=True)
class _CouplingStack:
    """Stacked conditioner-MLP parameters, leading axis = layer."""

    w0: jnp.ndarray  # (L, d1, H)
    b0: jnp.ndarray  # (L, H)
    w1: jnp.ndarray  # (L, H, H)
    b1: jnp.ndarray  # (L, H, H) -> (L, H)
    w2: jnp.ndarray  # (L, H, 2*d2)
    b2: jnp.ndarray  # (L, 2*d2)


jax.tree_util.register_dataclass(
    _CouplingStack, data_fields=["w0", "b0", "w1", "b1", "w2", "b2"],
    meta_fields=[],
)


def _mlp_t(params, x_t):
    """Feature-major conditioner: x_t (d1, N) -> (2*d2, N).

    Stored weight layout is unchanged (``(d1,H), (H,H), (H,2*d2)`` — same
    pytree/checkpoints as the batch-major version); the transposed matmuls
    contract the stored leading axis so the batch stays on lanes."""
    w0, b0, w1, b1, w2, b2 = params
    # (H, d1) @ (d1, N): d1 is tiny (dim//2-ish) — XLA lowers it to a
    # broadcast multiply-add; the FLOPs live in the (H, H) @ (H, N) core.
    h = jax.nn.relu(jnp.tensordot(w0, x_t, axes=((0,), (0,)))
                    + b0[:, None])
    h = jax.nn.relu(jnp.tensordot(w1, h, axes=((0,), (0,))) + b1[:, None])
    return jnp.tensordot(w2, h, axes=((0,), (0,))) + b2[:, None]


@dataclasses.dataclass(frozen=True)
class CouplingFlow:
    base: DiagGaussian
    stack: _CouplingStack

    # ------------------------------------------------------------- factory
    @staticmethod
    def create(key, dim: int, n_layers: int = 32, hidden: int = 128,
               base: DiagGaussian | None = None) -> "CouplingFlow":
        if base is None:
            base = DiagGaussian.create(dim)
        d2 = dim // 2
        d1 = dim - d2
        if d2 == 0:
            raise ValueError("CouplingFlow needs dim >= 2")
        k0, k1 = jax.random.split(key)
        init = jax.nn.initializers.lecun_normal()
        w0 = init(k0, (n_layers, d1, hidden), jnp.float32)
        w1 = init(k1, (n_layers, hidden, hidden), jnp.float32)
        stack = _CouplingStack(
            w0=w0,
            b0=jnp.zeros((n_layers, hidden)),
            w1=w1,
            b1=jnp.zeros((n_layers, hidden)),
            w2=jnp.zeros((n_layers, hidden, 2 * d2)),  # identity at init
            b2=jnp.zeros((n_layers, 2 * d2)),
        )
        return CouplingFlow(base=base, stack=stack)

    # ------------------------------------------------------------ geometry
    @property
    def dim(self) -> int:
        return self.base.dim

    @property
    def _d2(self) -> int:
        return self.dim // 2

    @property
    def n_layers(self) -> int:
        return self.stack.w0.shape[0]

    # ------------------------------------------------------------- kernels
    def _fwd_layer_t(self, u_t, layer_params):
        """base -> data direction for one block.  u_t: (dim, N)."""
        d2 = self._d2
        u1, u2 = u_t[: self.dim - d2], u_t[self.dim - d2:]
        ts = _mlp_t(layer_params, u1)
        t, s = ts[:d2], ts[d2:]
        v2 = u2 * jnp.exp(s) + t
        out = jnp.roll(jnp.concatenate([u1, v2], axis=0), d2, axis=0)
        return out, jnp.sum(s, axis=0)

    def _inv_layer_t(self, v_t, layer_params):
        """data -> base direction for one block.  v_t: (dim, N)."""
        d2 = self._d2
        u = jnp.roll(v_t, -d2, axis=0)
        u1, v2 = u[: self.dim - d2], u[self.dim - d2:]
        ts = _mlp_t(layer_params, u1)
        t, s = ts[:d2], ts[d2:]
        u2 = (v2 - t) * jnp.exp(-s)
        return jnp.concatenate([u1, u2], axis=0), jnp.sum(s, axis=0)

    def _stack_leaves(self):
        return (self.stack.w0, self.stack.b0, self.stack.w1,
                self.stack.b1, self.stack.w2, self.stack.b2)

    # -------------------------------------------------- transposed-native api
    def push_t(self, z_t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """base -> data over all layers.  z_t: (dim, N) -> (x_t, sum log|s|)."""
        def body(carry, params):
            u, acc = carry
            u, s_sum = self._fwd_layer_t(u, params)
            return (u, acc + s_sum), None

        # zeros_like(z_t[0]) (not zeros(n)) so the accumulator inherits the
        # device-varying type under shard_map
        (x_t, s_total), _ = jax.lax.scan(
            body, (z_t, jnp.zeros_like(z_t[0])), self._stack_leaves())
        return x_t, s_total

    def pull_t(self, x_t) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """data -> base over all layers.  x_t: (dim, N) -> (z_t, sum log|s|)."""
        def body(carry, params):
            v, acc = carry
            v, s_sum = self._inv_layer_t(v, params)
            return (v, acc + s_sum), None

        (z_t, s_total), _ = jax.lax.scan(
            body, (x_t, jnp.zeros_like(x_t[0])), self._stack_leaves(),
            reverse=True)
        return z_t, s_total

    def forward_t(self, key, num_samples: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample in the feature-major layout: ``(x_t (dim, N), log q (N,))``."""
        z, log_p = self.base.forward(key, num_samples)
        x_t, s_total = self.push_t(z.T)
        return x_t, log_p - s_total

    def log_prob_t(self, x_t) -> jnp.ndarray:
        """``log q`` of feature-major points ``x_t: (dim, N) -> (N,)``."""
        z_t, s_total = self.pull_t(jnp.asarray(x_t, jnp.float32))
        return self.base.log_prob(z_t.T) - s_total

    # ----------------------------------------------------------------- api
    def forward(self, key, num_samples: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample and return ``(x, log q(x))``."""
        x_t, log_q = self.forward_t(key, num_samples)
        return x_t.T, log_q

    def sample(self, key, num_samples: int = 1) -> jnp.ndarray:
        return self.forward(key, num_samples)[0]

    def log_prob(self, x) -> jnp.ndarray:
        x = jnp.asarray(x, jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None]
        out = self.log_prob_t(x.T)
        return out[0] if squeeze else out

    def forward_kld(self, x) -> jnp.ndarray:
        """Forward KL training loss: ``-mean log q(x)`` on data ``x``
        (reference ``NF_model.forward_kld``, ``GLMCMC_NFs.py:119``)."""
        return -jnp.mean(self.log_prob(x))


jax.tree_util.register_dataclass(
    CouplingFlow, data_fields=["base", "stack"], meta_fields=[]
)
