"""Marjoram-style ABC-MCMC baseline on the Mixture problem.

The reference cross-checks its samplers against R EasyABC's
``ABC_mcmc(method="Marjoram")`` (``examples/easyabc_Marjoram.R:1-17``):
plain random-walk ABC-MCMC with a *uniform (indicator) kernel* — accept the
simulated dataset iff its discrepancy is below epsilon.  That algorithm is
expressible directly in this framework's problem DSL: override
``kernel_log_prob`` with the indicator kernel and run the local-only
(global_frequency = 0) sampler.

Usage: python examples/marjoram.py --num-ite 100000 --chains 32
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MixtureProblem, chain_summary, esjd
from glabc_tpu.samplers import run_glmcmc


class MarjoramMixture(MixtureProblem):
    """Mixture problem with the uniform ABC kernel: log K = 0 if
    discrepancy <= epsilon else -inf (EasyABC Marjoram acceptance)."""

    def kernel_log_prob(self, dis, epsilon=None):
        if epsilon is None:
            epsilon = self.epsilon
        return jnp.where(dis <= epsilon, 0.0, -jnp.inf)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-ite", type=int, default=20_000)
    p.add_argument("--chains", type=int, default=32)
    p.add_argument("--epsilon", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    model = MarjoramMixture(epsilon=args.epsilon)
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
    ip = DiagGaussian.create(2, 0.0, 0.0)  # unused at gf=0

    # find a valid initial state (indicator kernel needs dis <= eps at init)
    key = jax.random.PRNGKey(args.seed)
    theta0 = jnp.array([1.5, 1.5])
    y0 = model.y_obs  # start exactly at the observation: dis = 0

    res = run_glmcmc(model, key, args.num_ite, theta0, ip, lp,
                     global_frequency=0.0, batch_size=1, y0=y0,
                     num_chains=args.chains,
                     segment_size=min(args.num_ite, 50_000))
    ch = res.thetas[:, args.num_ite // 5:, :]
    s = chain_summary(ch)
    print(s.render())
    flat = ch.reshape(-1, 2).astype(np.float64)
    print(f"absmean: {np.abs(flat).mean(0)}")
    print(f"acceptance: {float(res.acceptance_rates()['local'].mean()):.4f}")
    print(f"ESJD (chain 0): {float(esjd(res.thetas[0])):.5f}")


if __name__ == "__main__":
    main()
