"""GLMCMC-NF throughput: scan path vs pooled fast path, TPU.

Measures transitions/s at the canonical reference config
(``GLMCMC_NFs.py:43``: gf=0.5, batch_size=5, step_size=200, Train_step=50)
across chain counts.  Used for the VERDICT round-3 item-1 done-criterion
(fast path >= 10x scan, or >= 50M trans/s/chip).

Usage: python benchmarks/nf_bench.py [--mode scan|pooled|fused] [--chains N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_scan(C: int, steps: int = 400):
    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.models.flows import CouplingFlow
    from glabc_tpu.samplers.chain import init_chain_carry
    from glabc_tpu.samplers.glmcmc_nf import GLMCMCNFConfig, build_nf_step
    import functools

    problem = MixtureProblem(0.05)
    lp = DiagGaussian.create(2, 0.0, float(np.log(0.35)))
    cfg = GLMCMCNFConfig()
    flow = CouplingFlow.create(jax.random.PRNGKey(1), 2, 32, 128)
    jax.block_until_ready(flow.stack.w1)
    print(f"[scan C={C}] device claimed, building step...", flush=True)
    step = build_nf_step(problem, lp, cfg)
    carry = init_chain_carry(problem, jax.random.PRNGKey(0), jnp.zeros(2),
                             None, C)
    batched = jax.vmap(step, in_axes=(None, 0, None))

    @jax.jit
    def segment(flow_, carry_):
        def body(cc, _):
            return batched(flow_, cc, None)[0], None
        return jax.lax.scan(body, carry_, None, length=steps)[0]

    print(f"[scan C={C}] compiling {steps}-step segment...", flush=True)
    carry = segment(flow, carry)
    jax.block_until_ready(carry.theta)
    print(f"[scan C={C}] compiled; timing", flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = segment(flow, carry)
        jax.block_until_ready(carry.theta)
        best = min(best, time.perf_counter() - t0)
    return C * steps / best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="scan")
    ap.add_argument("--chains", type=int, default=0)
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()
    chain_counts = [args.chains] if args.chains else [1024, 8192, 32768]
    for C in chain_counts:
        if args.mode == "scan":
            tps = bench_scan(C, args.steps)
        elif args.mode == "pooled":
            from glabc_tpu.samplers.glmcmc_nf_fused import bench_pooled
            tps = bench_pooled(C, args.steps)
        else:
            raise SystemExit(f"unknown mode {args.mode}")
        print(f"mode={args.mode} chains={C} steps={args.steps} "
              f"-> {tps:,.0f} transitions/s", flush=True)


if __name__ == "__main__":
    main()
