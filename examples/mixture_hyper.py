"""Hyperparameter selection by ESJD-per-second.

Parity with reference ``glabcmcmc/examples/Mixture_hyper.py:23-41``: grid of
``global_frequency in {0, 0.1, ..., 1}`` x seeds, short GLMCMC runs, score =
``esjd(chain) / (wallclock / num_ite)``, report the argmax.

TPU redesign: each grid cell runs all seeds *as vectorized chains in one
jitted run* (the reference loops seeds in Python); wallclock is per-cell so
the score stays ESJD-per-second-per-chain, comparable to the reference's.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MixtureProblem, esjd
from glabc_tpu.samplers import run_glmcmc


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-ite", type=int, default=1000)
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=5)
    args = p.parse_args()

    model = MixtureProblem(epsilon=0.05)
    theta0 = jnp.zeros(2)
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
    ip = DiagGaussian.create(2, 0.0, 0.0)

    gfs = np.round(np.arange(0.0, 1.01, 0.1), 1)
    scores = []
    for gf in gfs:
        t0 = time.time()
        res = run_glmcmc(model, jax.random.PRNGKey(0), args.num_ite, theta0,
                         ip, lp, float(gf), args.batch_size,
                         num_chains=args.seeds,
                         segment_size=args.num_ite)
        wall = time.time() - t0
        per_seed_esjd = np.asarray(esjd(jnp.asarray(res.thetas)))
        score = per_seed_esjd.mean() / (wall / args.num_ite)
        scores.append(score)
        print(f"gf={gf:.1f}  esjd={per_seed_esjd.mean():.5f}  "
              f"wall={wall:.2f}s  esjd/s={score:.3f}")

    best = gfs[int(np.argmax(scores))]
    print(f"\nbest global_frequency = {best}")


if __name__ == "__main__":
    main()
