"""Component micro-profile of the fused GLMCMC-NF epoch on TPU.

Breaks one gf=1 epoch into: pool draw (C*T*B flow forwards + sim + weight),
pool training step, kernel-layout pack, pool-iSIR kernel segment, and the
per-epoch state log-prob — so the end-to-end bound (flow FLOPs vs HBM vs
kernel vs dispatch) is attributable.

Usage: python benchmarks/nf_profile.py [--chains 32768] [--flow-only]
"""

import argparse
import functools
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1e3:9.1f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--flow-only", action="store_true")
    ap.add_argument("--rows", type=int, default=1 << 20,
                    help="rows for --flow-only forward/log_prob timings")
    args = ap.parse_args()

    from glabc_tpu import MixtureProblem
    from glabc_tpu.models.flows import CouplingFlow

    prob = MixtureProblem(0.05)
    key = jax.random.PRNGKey(0)
    flow = CouplingFlow.create(key, 2, 32, 128)
    jax.block_until_ready(flow.stack.w1)
    print(f"backend={jax.devices()[0].platform}", flush=True)

    if args.flow_only:
        from glabc_tpu.ops.pallas.flow_kernel import (
            flow_pull_fused,
            flow_push_fused,
        )

        N = args.rows
        flops = N * 32 * 2 * (128 * 128 + 128 * 1 + 128 * 2)

        def report_tflops(label, dt):
            print(f"  {label}: {flops/dt/1e12:.1f} TFLOP/s achieved",
                  flush=True)

        fwd = jax.jit(lambda f, k: f.forward(k, N))
        timeit(f"XLA flow.forward {N} rows", fwd, flow, key)
        th = jax.random.normal(key, (N, 2))
        th_t = th.T
        lp = jax.jit(lambda f, x: f.log_prob(x))
        timeit(f"XLA flow.log_prob {N} rows", lp, flow, th)

        for dt_name in ("float32", "bfloat16"):
            push = jax.jit(functools.partial(
                flow_push_fused, block_rows=2048, matmul_dtype=dt_name))
            z_t = jax.random.normal(key, (2, N))
            out = timeit(f"pallas push {dt_name} {N} rows", push, flow, z_t)
            t0 = time.perf_counter()
            jax.block_until_ready(push(flow, z_t))
            report_tflops(f"push {dt_name}", time.perf_counter() - t0)
            pull = jax.jit(functools.partial(
                flow_pull_fused, block_rows=2048, matmul_dtype=dt_name))
            timeit(f"pallas pull {dt_name} {N} rows", pull, flow, th_t)
            del out
        return

    C, T, B = args.chains, args.steps, args.batch
    from glabc_tpu.samplers.glmcmc_nf import GLMCMCNFConfig, make_optimizer
    from glabc_tpu.samplers.glmcmc_nf_fused import (
        _make_nf_fused_helpers,
        make_nf_pool_fn,
        make_pool_trainer,
    )
    from glabc_tpu.ops.pallas.pool_isir_kernel import PoolISIR

    cfg = GLMCMCNFConfig(1.0, B, T, 50, 32, 128, 5e-4, 1e-5)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(flow)
    pool_fn = make_nf_pool_fn(prob, C, T, B)
    train = make_pool_trainer(cfg, optimizer, C, 2)

    print(f"C={C} T={T} B={B}: pool rows/epoch = {C*T*B:,}", flush=True)
    pools = timeit("pool_fn (flow draw + sim + weight)", pool_fn, flow, key)
    timeit("train (resample + Adam step)", train, flow, opt_state, pools,
           key)

    d_pad = 8
    pack, state_logw, state_init, _resolve = _make_nf_fused_helpers(
        prob, 2, d_pad, C, T, B)
    packed = timeit("pack (pool -> kernel layout)", pack, pools)

    theta_k = state_init(jnp.zeros((C, 2)))
    logk = jnp.zeros((C,))
    logw_k = timeit("state_logw (C-row flow inverse)", state_logw, flow,
                    theta_k, logk)

    kern = PoolISIR(2, batch_size=B, steps_per_call=T,
                    block_chains=min(C, 1024), collect_history=True)
    timeit(f"PoolISIR kernel segment ({T} steps)", kern.run,
           np.int32(1), packed[0], packed[1], theta_k, logw_k)


if __name__ == "__main__":
    main()
