"""Ablation profile of the pooled GLMCMC-NF segment step on TPU.

The pooled path's per-step body = batched current-state flow log_prob +
vmapped per-chain cond(global iSIR over a pool slice, local RW move).
This times 400-step scans of each piece in isolation to locate the
~28 ms/step observed end-to-end (flow pull alone is ~0.4 ms at 8k rows).

Usage: python benchmarks/pooled_profile.py [--chains 8192]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(label, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best*1e3:9.1f} ms", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=400)
    args = ap.parse_args()

    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.models.flows import CouplingFlow
    from glabc_tpu.samplers.aglmcmc import AGLCarry
    from glabc_tpu.samplers.chain import init_chain_carry
    from glabc_tpu.samplers.glmcmc_nf import GLMCMCNFConfig
    from glabc_tpu.samplers.glmcmc_nf_fused import (
        _build_pooled_bodies,
        make_nf_pool_fn,
        make_pooled_segment,
    )

    prob = MixtureProblem(0.05)
    lp = DiagGaussian.create(2, 0.0, float(np.log(0.35)))
    C, S, B = args.chains, args.steps, 5
    pool_slices = 258
    cfg = GLMCMCNFConfig(0.5, B, 200, 50, 32, 128, 5e-4, 1e-5)
    key = jax.random.PRNGKey(0)
    flow = CouplingFlow.create(key, 2, 32, 128)
    jax.block_until_ready(flow.stack.w1)
    print(f"backend={jax.devices()[0].platform} C={C} steps/seg={S}",
          flush=True)

    pool_fn = make_nf_pool_fn(prob, C, pool_slices, B)
    pools = timeit("pool_fn", pool_fn, flow, key)

    cc = init_chain_carry(prob, key, jnp.zeros(2), None, C)
    carry = AGLCarry(cc.theta, cc.y, cc.log_kernel,
                     jnp.zeros((C,), jnp.int32), cc.key, cc.counts)

    # full segment (per-chain coin), pallas + xla flow backends
    for backend in ("pallas", "xla"):
        seg = make_pooled_segment(prob, lp, flow, cfg, pool_slices, False,
                                  backend)
        out = timeit(f"segment per-chain coin [{backend}]", seg, flow,
                     pools, carry, key, S)
    seg_sh = make_pooled_segment(prob, lp, flow, cfg, pool_slices, True,
                                 "pallas")
    timeit("segment shared coin [pallas]", seg_sh, flow, pools, carry,
           key, S)

    # ablations: scan of each body alone
    global_move, local_move = _build_pooled_bodies(prob, lp, cfg, pool_slices)
    v_global = jax.vmap(global_move, in_axes=(0, 0, 0))
    v_local = jax.vmap(local_move)

    from glabc_tpu.ops.pallas.flow_kernel import flow_pull_fused

    @functools.partial(jax.jit, static_argnames=("length",))
    def scan_logq_pallas(flow_, carry_, length):
        def body(c, _):
            z_t, s = flow_pull_fused(flow_, c.theta.T, block_rows=2048)
            logq = flow_.base.log_prob(z_t.T) - s
            return c, jnp.sum(logq)
        return jax.lax.scan(body, carry_, None, length=length)

    @functools.partial(jax.jit, static_argnames=("length",))
    def scan_logq_xla(flow_, carry_, length):
        def body(c, _):
            return c, jnp.sum(flow_.log_prob(c.theta))
        return jax.lax.scan(body, carry_, None, length=length)

    @functools.partial(jax.jit, static_argnames=("length",))
    def scan_local(carry_, length):
        def body(c, _):
            c2, _out = v_local(c)
            return c2, None
        return jax.lax.scan(body, carry_, None, length=length)

    @functools.partial(jax.jit, static_argnames=("length",))
    def scan_global(pools_, carry_, length):
        def body(c, _):
            logq = jnp.zeros((c.theta.shape[0],))
            c2, _out = v_global(pools_, logq, c)
            return c2, None
        return jax.lax.scan(body, carry_, None, length=length)

    timeit("scan: flow pull only [pallas]", scan_logq_pallas, flow, carry, S)
    timeit("scan: flow pull only [xla]", scan_logq_xla, flow, carry, S)
    timeit("scan: local move only", scan_local, carry, S)
    timeit("scan: global move only", scan_global, pools, carry, S)


if __name__ == "__main__":
    main()
