"""g-and-k distribution inference: a heavier, real-world-style ABC problem.

Usage: python examples/gk.py --num-ite 20000 --chains 64
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, GKProblem, chain_summary
from glabc_tpu.samplers import run_glmcmc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-ite", type=int, default=10_000)
    p.add_argument("--chains", type=int, default=64)
    p.add_argument("--epsilon", type=float, default=1.0)
    p.add_argument("--num-draws", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    prob = GKProblem(epsilon=args.epsilon, num_draws=args.num_draws)
    print(f"true theta = (3, 1, 2, 0.5); y_obs octiles = "
          f"{np.round(np.asarray(prob.y_obs), 2)}")

    ip = DiagGaussian.create(4, loc=5.0, log_scale=float(jnp.log(3.0)))
    lp = DiagGaussian.create(4, 0.0, float(jnp.log(0.25)))
    res = run_glmcmc(prob, jax.random.PRNGKey(args.seed), args.num_ite,
                     jnp.full(4, 5.0), ip, lp, 0.7, 5,
                     num_chains=args.chains,
                     segment_size=min(args.num_ite, 20_000))
    burn = args.num_ite // 4
    ch = res.thetas[:, burn:, :]
    print(chain_summary(ch).render())
    rates = res.acceptance_rates()
    print(f"acceptance global/local: {float(rates['global'].mean()):.4f} / "
          f"{float(rates['local'].mean()):.4f}")


if __name__ == "__main__":
    main()
