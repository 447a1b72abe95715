"""Per-phase wall profile of the run_glmcmc_nf_fused driver loop on TPU.

nf_profile.py times the jitted components in isolation (fast); the e2e
bench is slower — this script times the DRIVER's actual per-epoch phase
sequence (with the same Python-side syncs) to locate the gap.

Usage: python benchmarks/nf_driver_profile.py [--chains 8192] [--epochs 4]
  [--no-history]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8192)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--no-history", action="store_true")
    args = ap.parse_args()

    from glabc_tpu import MixtureProblem
    from glabc_tpu.models.flows import CouplingFlow
    from glabc_tpu.samplers.chain import init_chain_carry
    from glabc_tpu.samplers.glmcmc_nf import GLMCMCNFConfig, make_optimizer
    from glabc_tpu.samplers.glmcmc_nf_fused import (
        _make_nf_fused_helpers,
        make_nf_pool_fn,
        make_pool_trainer,
    )
    from glabc_tpu.samplers.aglmcmc_fused import _AsyncBlocks
    from glabc_tpu.ops.pallas.pool_isir_kernel import PoolISIR

    prob = MixtureProblem(0.05)
    C, T, B, d, d_pad = args.chains, 200, 5, 2, 8
    collect = not args.no_history
    cfg = GLMCMCNFConfig(1.0, B, T, 50, 32, 128, 5e-4, 1e-5)
    key = jax.random.PRNGKey(0)
    flow = CouplingFlow.create(key, d, 32, 128)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(flow)
    jax.block_until_ready(flow.stack.w1)
    print(f"backend={jax.devices()[0].platform} C={C} history={collect}",
          flush=True)

    cc = init_chain_carry(prob, key, jnp.zeros(d), None, C)
    pool_fn = make_nf_pool_fn(prob, C, T, B)
    train = make_pool_trainer(cfg, optimizer, C, d)
    pack, state_logw, state_init, resolve = _make_nf_fused_helpers(
        prob, d, d_pad, C, T, B)
    kern = PoolISIR(d, batch_size=B, steps_per_call=T,
                    block_chains=min(C, 1024), collect_history=collect)

    pools = pool_fn(flow, key)
    theta_k = state_init(cc.theta)
    logw_k = state_logw(flow, theta_k, cc.log_kernel)
    y_cur, logk = cc.y, cc.log_kernel
    ptheta, plogw = pack(pools)
    # warm up every jit
    out = kern.run(np.int32(1), ptheta, plogw, theta_k, logw_k)
    jax.block_until_ready(out[0])
    flow2, opt2, loss = train(flow, opt_state, pools, key)
    jax.block_until_ready(flow2.stack.w1)
    print("compiled; profiling epochs", flush=True)

    async_blocks = _AsyncBlocks(d)
    g_acc = np.zeros((C,), np.float64)
    num_train = 0
    phases = {}

    def tick(name, t0):
        phases[name] = phases.get(name, 0.0) + (time.perf_counter() - t0)
        return time.perf_counter()

    t_all = time.perf_counter()
    k_loop = key
    for ep in range(args.epochs):
        t0 = time.perf_counter()
        k_loop, k_tr, k_pl = jax.random.split(k_loop, 3)
        flow, opt_state, loss = train(flow, opt_state, pools, k_tr)
        fl = float(loss)
        t0 = tick("train(+float(loss) sync)", t0)
        pools = pool_fn(flow, k_pl)
        t0 = tick("pool_fn dispatch", t0)
        ptheta, plogw = pack(pools)
        logw_k = state_logw(flow, theta_k, logk)
        t0 = tick("pack+state_logw dispatch", t0)
        theta_k, logw_k, sel, moved, hist = kern.run(
            np.int32(1 + ep), ptheta, plogw, theta_k, logw_k)
        t0 = tick("kern.run dispatch", t0)
        if collect:
            async_blocks.add(hist, T)
            t0 = tick("async_blocks.add", t0)
        y_cur, logk = resolve(pools, sel, y_cur, logk)
        t0 = tick("resolve dispatch", t0)
        g_acc += np.asarray(moved)[0] * 1.0
        t0 = tick("np.asarray(moved) SYNC", t0)
    if collect:
        t0 = time.perf_counter()
        blocks = async_blocks.blocks()
        tick("history materialize (end)", t0)
    jax.block_until_ready(theta_k)
    dt = time.perf_counter() - t_all
    for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"  {k:32s} {v/args.epochs*1e3:9.1f} ms/epoch", flush=True)
    tps = C * T * args.epochs / dt
    print(f"TOTAL {dt/args.epochs*1e3:.0f} ms/epoch -> {tps:,.0f} trans/s",
          flush=True)


if __name__ == "__main__":
    main()
