"""MA(2) time-series ABC via the generic fused Pallas path.

Demonstrates extending the fused (speed-of-light) kernel to a user problem:
``MA2Problem`` supplies the host-side ABC definition and
``MA2Problem.tile_program()`` its tile-level lowering (streaming in-kernel
simulator, triangular-prior masking, box-uniform iSIR proposal) — see
``glabc_tpu.ops.pallas.generic_kernel``.

Usage:
    python examples/ma2.py --method fused --num-ite 10000     # TPU
    python examples/ma2.py --method scan  --num-ite 2000      # any backend
    python examples/ma2.py --method aglmcmc --num-ite 4000    # adaptive,
        # gf<1 fused mixed kernel on a NON-Mixture problem via tile_program
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MA2Problem, Uniform, chain_summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--method", choices=["fused", "scan", "aglmcmc"],
                   default="scan")
    p.add_argument("--num-ite", type=int, default=2000)
    p.add_argument("--chains", type=int, default=None)
    p.add_argument("--num-draws", type=int, default=100)
    p.add_argument("--epsilon", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    prob = MA2Problem(epsilon=args.epsilon, num_draws=args.num_draws)
    print(f"true theta = (0.6, 0.2); y_obs autocovariances = "
          f"{np.round(np.asarray(prob.y_obs), 3)}")

    key = jax.random.PRNGKey(args.seed)
    theta0 = jnp.zeros(2)
    t0 = time.time()
    if args.method == "aglmcmc":
        # adaptive AGLMCMC at gf=0.5: pool-iSIR + the MA(2) local move
        # fused in-kernel through the tile program; shared cross-chain
        # KDE adaptation on the XLA path
        from glabc_tpu.samplers.aglmcmc_fused import run_aglmcmc_fused_mixed
        chains = args.chains or 4096
        ip = DiagGaussian.create(2, 0.0, float(jnp.log(0.5)))
        res = run_aglmcmc_fused_mixed(
            prob, key, args.num_ite, theta0, ip, global_frequency=0.5,
            batch_size=5, step_size=200, num_chains=chains,
            block_chains=min(chains, 1024), shared_support=2048,
            tile_program=prob.tile_program(lp_scale=0.1),
            interpret=(jax.devices()[0].platform == "cpu"))
    elif args.method == "fused":
        from glabc_tpu.samplers import run_fused_program
        chains = args.chains or 4096
        res = run_fused_program(prob, prob.tile_program(lp_scale=0.1), key,
                                args.num_ite, theta0, global_frequency=0.8,
                                batch_size=5, num_chains=chains,
                                steps_per_call=256, block_chains=512)
    else:
        from glabc_tpu.samplers import run_glmcmc
        chains = args.chains or 16
        ip = Uniform(jnp.array([-2.0, -1.0], jnp.float32),
                     jnp.array([2.0, 1.0], jnp.float32))
        lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.1)))
        res = run_glmcmc(prob, key, args.num_ite, theta0, ip, lp, 0.8, 5,
                         num_chains=chains,
                         segment_size=min(args.num_ite, 20_000))
    dt = time.time() - t0

    burn = args.num_ite // 4
    ch = res.thetas[:, burn:, :]
    print(chain_summary(ch).render())
    rates = res.acceptance_rates()
    print(f"acceptance global/local: {float(rates['global'].mean()):.4f} / "
          f"{float(rates['local'].mean()):.4f}")
    print(f"{args.method}: {chains} chains x {args.num_ite} iters in "
          f"{dt:.1f}s = {chains * (args.num_ite - 1) / dt:,.0f} "
          f"transitions/s")


if __name__ == "__main__":
    main()
