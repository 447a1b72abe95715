"""Minimal `normflows` shim for running the reference GLMCMC_NF sampler.

The reference (`/root/reference/glabcmcmc/GLMCMC_NFs.py:7,56-61`) depends on
normflows>=1.7.2, which is not installed in this environment (and installing
packages is not permitted).  This module reimplements, in plain torch, the
EXACT subset of the normflows API that the reference uses:

- ``nf.nets.MLP([1, 128, 128, 2], init_zeros=True)``   (leaky=0.0 LeakyReLU)
- ``nf.flows.AffineCouplingBlock(param_map)``          (channel split,
  scale_map='exp': z2' = z2 * exp(s) + t, interleaved (t, s) output columns)
- ``nf.flows.Permute(dim, mode='swap')``               (swap channel halves)
- ``nf.NormalizingFlow(base, flows)`` with ``sample`` / ``log_prob`` /
  ``forward_kld`` semantics (sample: base -> forward through flows,
  log_q -= log_det; log_prob: inverse through reversed flows + base log_prob)
- ``nf.distributions.base.DiagGaussian(d)``            (trainable loc /
  log_scale, included in ``parameters()`` exactly as in normflows)

Semantics follow normflows 1.7.x source (flows/affine/coupling.py,
nets/mlp.py, distributions/base.py, core.py).  This file exists only so the
reference can be executed for parity-number generation; it is NOT part of the
glabc_tpu framework (whose flow lives in glabc_tpu/models/flows.py, in JAX).

Usage: ``sys.modules['normflows'] = make_shim()`` before importing
``glabcmcmc.GLMCMC_NFs``.
"""

import math
import types

import torch
import torch.nn as nn


class MLP(nn.Module):
    """normflows.nets.MLP: Linear/LeakyReLU stack, optional zero-init last layer."""

    def __init__(self, layers, leaky=0.0, init_zeros=False):
        super().__init__()
        net = []
        for k in range(len(layers) - 2):
            net.append(nn.Linear(layers[k], layers[k + 1]))
            net.append(nn.LeakyReLU(leaky))
        net.append(nn.Linear(layers[-2], layers[-1]))
        if init_zeros:
            nn.init.zeros_(net[-1].weight)
            nn.init.zeros_(net[-1].bias)
        self.net = nn.Sequential(*net)

    def forward(self, x):
        return self.net(x)


class AffineCouplingBlock(nn.Module):
    """normflows.flows.AffineCouplingBlock with split_mode='channel', scale_map='exp'.

    forward (latent -> data):  z1, z2 = chunk(z); (t, s) = interleave(param_map(z1));
      z2' = z2 * exp(s) + t;   log_det = sum(s)
    inverse: z2 = (z2' - t) * exp(-s); log_det = -sum(s)
    """

    def __init__(self, param_map):
        super().__init__()
        self.param_map = param_map

    def _params(self, z1):
        param = self.param_map(z1)
        shift = param[:, 0::2]
        scale = param[:, 1::2]
        return shift, scale

    def forward(self, z):
        z1, z2 = z.chunk(2, dim=1)
        shift, scale = self._params(z1)
        z2 = z2 * torch.exp(scale) + shift
        log_det = torch.sum(scale, dim=1)
        return torch.cat([z1, z2], dim=1), log_det

    def inverse(self, z):
        z1, z2 = z.chunk(2, dim=1)
        shift, scale = self._params(z1)
        z2 = (z2 - shift) * torch.exp(-scale)
        log_det = -torch.sum(scale, dim=1)
        return torch.cat([z1, z2], dim=1), log_det


class Permute(nn.Module):
    """normflows.flows.Permute(mode='swap'): swap the two channel halves."""

    def __init__(self, num_channels, mode="swap"):
        super().__init__()
        assert mode == "swap"
        self.num_channels = num_channels

    def _swap(self, z):
        h = self.num_channels // 2
        return torch.cat([z[:, h:], z[:, :h]], dim=1)

    def forward(self, z):
        return self._swap(z), torch.zeros(z.shape[0], device=z.device)

    def inverse(self, z):
        return self._swap(z), torch.zeros(z.shape[0], device=z.device)


class DiagGaussian(nn.Module):
    """normflows.distributions.base.DiagGaussian: trainable diagonal Gaussian."""

    def __init__(self, shape, trainable=True):
        super().__init__()
        if isinstance(shape, int):
            shape = (shape,)
        self.shape = shape
        self.d = int(torch.prod(torch.tensor(shape)))
        if trainable:
            self.loc = nn.Parameter(torch.zeros(1, *shape))
            self.log_scale = nn.Parameter(torch.zeros(1, *shape))
        else:
            self.register_buffer("loc", torch.zeros(1, *shape))
            self.register_buffer("log_scale", torch.zeros(1, *shape))

    def forward(self, num_samples=1):
        eps = torch.randn(num_samples, *self.shape, device=self.loc.device)
        z = self.loc + torch.exp(self.log_scale) * eps
        log_p = -0.5 * self.d * math.log(2 * math.pi) - torch.sum(
            self.log_scale + 0.5 * eps**2, dim=1
        )
        return z, log_p

    def log_prob(self, z):
        eps = (z - self.loc) / torch.exp(self.log_scale)
        return -0.5 * self.d * math.log(2 * math.pi) - torch.sum(
            self.log_scale + 0.5 * eps**2, dim=1
        )

    def sample(self, num_samples=1):
        return self.forward(num_samples)[0]


class NormalizingFlow(nn.Module):
    """normflows.NormalizingFlow core: sample / log_prob / forward_kld."""

    def __init__(self, q0, flows):
        super().__init__()
        self.q0 = q0
        self.flows = nn.ModuleList(flows)

    def sample(self, num_samples=1):
        z, log_q = self.q0(num_samples)
        for flow in self.flows:
            z, log_det = flow(z)
            log_q -= log_det
        return z, log_q

    def log_prob(self, x):
        log_q = torch.zeros(x.shape[0], device=x.device)
        z = x
        for i in range(len(self.flows) - 1, -1, -1):
            z, log_det = self.flows[i].inverse(z)
            log_q += log_det
        log_q += self.q0.log_prob(z)
        return log_q

    def forward_kld(self, x):
        return -torch.mean(self.log_prob(x))


def make_shim():
    nf = types.ModuleType("normflows")
    nf.nets = types.ModuleType("normflows.nets")
    nf.nets.MLP = MLP
    nf.flows = types.ModuleType("normflows.flows")
    nf.flows.AffineCouplingBlock = AffineCouplingBlock
    nf.flows.Permute = Permute
    nf.distributions = types.ModuleType("normflows.distributions")
    nf.distributions.base = types.ModuleType("normflows.distributions.base")
    nf.distributions.base.DiagGaussian = DiagGaussian
    nf.NormalizingFlow = NormalizingFlow
    return nf
