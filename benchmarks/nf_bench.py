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


def bench_pooled(C: int, epochs: int = 4, shared_coin: bool = False,
                 gf: float = 0.5, cadence: str = "cursor", thin: int = 1,
                 history_dtype=None):
    """End-to-end pooled path at the canonical config: gf=0.5, B=5,
    step_size=200 (seg_len=400) — includes pool redraws and flow training."""
    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.samplers.glmcmc_nf_fused import run_glmcmc_nf_pooled

    problem = MixtureProblem(0.05)
    lp = DiagGaussian.create(2, 0.0, float(np.log(0.35)))
    jax.block_until_ready(jnp.zeros(()))
    print(f"[pooled C={C} shared_coin={shared_coin} cadence={cadence}] "
          "device claimed",
          flush=True)
    kw = dict(global_frequency=gf, batch_size=5, step_size=200,
              train_steps=50, num_chains=C, shared_coin=shared_coin,
              cadence=cadence, thin=thin, history_dtype=history_dtype)
    seg_len = int(round(200 / gf))
    # warmup compile: one segment + one train + one redraw
    run_glmcmc_nf_pooled(problem, jax.random.PRNGKey(0), seg_len + 2,
                         jnp.zeros(2), lp, **kw)
    print(f"[pooled C={C}] compiled; timing {epochs} epochs", flush=True)
    num_ite = 1 + epochs * seg_len
    t0 = time.perf_counter()
    res = run_glmcmc_nf_pooled(problem, jax.random.PRNGKey(1), num_ite,
                               jnp.zeros(2), lp, **kw)
    dt = time.perf_counter() - t0
    burn = min(seg_len, (num_ite - 1) // 2) // max(1, thin)
    absmean = np.abs(np.asarray(res.thetas[:, burn:, :],
                                np.float64)).mean((0, 1))
    rates = res.acceptance_rates()
    print(f"[pooled C={C}] absmean={absmean} "
          f"g_acc={float(np.mean(rates['global'])):.4f} "
          f"l_acc={float(np.mean(rates['local'])):.4f}", flush=True)
    return C * (num_ite - 1) / dt


def bench_fused(C: int, epochs: int = 4, thin: int = 1,
                history_dtype=None):
    """gf=1 pool-iSIR Pallas path, end-to-end with training + redraws."""
    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.samplers.glmcmc_nf_fused import run_glmcmc_nf_fused

    problem = MixtureProblem(0.05)
    jax.block_until_ready(jnp.zeros(()))
    print(f"[fused C={C}] device claimed", flush=True)
    kw = dict(batch_size=5, step_size=200, train_steps=50, num_chains=C,
              block_chains=min(C, 1024), thin=thin,
              history_dtype=history_dtype)
    run_glmcmc_nf_fused(problem, jax.random.PRNGKey(0), 202, jnp.zeros(2),
                        **kw)
    print(f"[fused C={C}] compiled; timing {epochs} epochs", flush=True)
    num_ite = 1 + epochs * 200
    t0 = time.perf_counter()
    res = run_glmcmc_nf_fused(problem, jax.random.PRNGKey(1), num_ite,
                              jnp.zeros(2), **kw)
    dt = time.perf_counter() - t0
    burn = min(200, (num_ite - 1) // 2) // max(1, thin)
    absmean = np.abs(np.asarray(res.thetas[:, burn:, :],
                                np.float64)).mean((0, 1))
    acc = float(res.counts.global_accepts.sum()
                / max(res.counts.global_attempts.sum(), 1))
    print(f"[fused C={C}] absmean={absmean} g_acc={acc:.4f}", flush=True)
    return C * (num_ite - 1) / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="scan",
                    choices=["scan", "pooled", "pooled-shared", "fused",
                             "slice"])
    ap.add_argument("--chains", type=int, nargs="*", default=[])
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--thin", type=int, default=1)
    ap.add_argument("--history-dtype", default=None)
    args = ap.parse_args()
    chain_counts = args.chains or [1024, 8192, 32768]
    for C in chain_counts:
        if args.mode == "scan":
            tps = bench_scan(C, args.steps)
        elif args.mode == "pooled":
            tps = bench_pooled(C, args.epochs)
        elif args.mode == "pooled-shared":
            tps = bench_pooled(C, args.epochs, shared_coin=True)
        elif args.mode == "slice":
            tps = bench_pooled(C, args.epochs, cadence="slice",
                               thin=args.thin,
                               history_dtype=args.history_dtype)
        else:
            tps = bench_fused(C, args.epochs, thin=args.thin,
                              history_dtype=args.history_dtype)
        print(f"mode={args.mode} chains={C} -> {tps:,.0f} transitions/s",
              flush=True)


if __name__ == "__main__":
    main()
