"""Canonical 2-D Gaussian-mixture ABC example.

Parity with reference ``glabcmcmc/examples/Mixture.py:56-79``: same problem
(epsilon=0.05, theta0=0, DiagGaussian proposals), same canonical
hyperparameters for all five samplers (``README.md:122-131``), with the TPU
extensions exposed (``--chains`` vectorized chains, ``--sampler all``).

Usage:
    python examples/mixture.py --sampler glmcmc --num-ite 100000 --chains 64
    python examples/mixture.py --sampler all --num-ite 10000
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import jax.numpy as jnp

from glabc_tpu import DiagGaussian, MCMCRunner, MixtureProblem, esjd


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sampler", default="glmcmc",
                   choices=["global", "glmcmc", "glmala", "nf", "aglmcmc",
                            "all"])
    p.add_argument("--num-ite", type=int, default=10_000)
    p.add_argument("--chains", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output-dir", default="./results")
    p.add_argument("--method", default="scan", choices=["scan", "fused"],
                   help="fused = Pallas kernels for GLMCMC/GLMALA/AGLMCMC "
                        "and the gf=1 pool-iSIR route for NF (TPU; chains "
                        "must be a multiple of the kernel block: 512/2048 "
                        "for GLMCMC/GLMALA, 1024 for AGLMCMC/NF)")
    args = p.parse_args()

    model = MixtureProblem(epsilon=0.05)
    theta0 = jnp.zeros(2)
    # canonical proposals (examples/Mixture.py:67-70)
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
    ip = DiagGaussian.create(2, 0.0, 0.0)
    gp = DiagGaussian.create(2, 0.0, 0.0)
    gp_base = DiagGaussian.create(2)

    runner = MCMCRunner(model, output_dir=args.output_dir, seed=args.seed,
                        num_chains=args.chains)

    def report(name, chain, dt):
        c = chain if chain.ndim == 2 else chain[0]
        print(f"{name}: {args.num_ite} iters in {dt:.1f}s "
              f"({args.chains * args.num_ite / dt:,.0f} transitions/s), "
              f"ESJD={float(esjd(c)):.5f}\n")

    which = args.sampler
    if which in ("global", "all"):
        t = time.time()
        ch = runner.run_global_mcmc(args.num_ite, theta0, None, 0.5, lp, gp,
                                    output_file="global_mcmc_results.csv")
        report("GlobalMCMC", ch, time.time() - t)
    if which in ("glmcmc", "all"):
        t = time.time()
        ch = runner.run_glmcmc(args.num_ite, theta0, None, 0.9, lp, ip, 5,
                               output_file="glmcmc_results.csv",
                               method=args.method)
        report("GLMCMC", ch, time.time() - t)
    if which in ("glmala", "all"):
        t = time.time()
        ch = runner.run_glmala(args.num_ite, theta0, None, 0.8, ip, 5, 0.3,
                               100, output_file="glmala_results.csv",
                               method=args.method)
        report("GLMALA", ch, time.time() - t)
    if which in ("nf", "all"):
        t = time.time()
        # scan/pooled/fused all valid; the example maps --method fused to
        # the gf=1 pool-iSIR route and scan to the pooled default
        nf_method = "fused" if args.method == "fused" else "pooled"
        nf_gf = 1.0 if nf_method == "fused" else 0.5
        if nf_method == "fused":
            print("[GLMCMC-NF] --method fused runs the gf=1 pool-iSIR "
                  "route (every move global); scan/pooled use gf=0.5",
                  flush=True)
        ch = runner.run_glmcmc_nf(args.num_ite, theta0, None, nf_gf, lp,
                                  gp_base, 5, 200, 50,
                                  output_file="glmcmc_nf_results.csv",
                                  method=nf_method)
        report("GLMCMC-NF", ch, time.time() - t)
    if which in ("aglmcmc", "all"):
        t = time.time()
        ch = runner.run_aglmcmc(args.num_ite, theta0, None, 1.0, lp, ip, 5,
                                200, 0.8, 0.2,
                                output_file="aglmcmc_results.csv",
                                method=args.method)
        report("AGLMCMC", ch, time.time() - t)


if __name__ == "__main__":
    main()
