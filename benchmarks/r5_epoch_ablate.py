"""Ablation profile of the FULL per-chain AGLMCMC adaptation epoch (r5).

The r4 profile timed components in isolation; their sum (~206 ms/chunk)
wildly exceeds the fused chunk cost (~41 ms), so isolated numbers cannot
rank the levers.  This script times the WHOLE jitted epoch with individual
stages ablated (replaced by shape-identical cheap stand-ins), at the
canonical 32k-chain config — the difference full-vs-ablated is each
stage's true marginal cost inside the fusion.

Usage: python benchmarks/r5_epoch_ablate.py [--chains 32768] [--chunk 1024]
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

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.models.kde import KernelDensity
from glabc_tpu.ops.resampling import stable_partition_take
from glabc_tpu.samplers.aglmcmc import (
    _NAN_DIS,
    _PRIOR_CUTOFF,
    AGLMCMCConfig,
    _pool_from_proposals,
)

P_DEFAULT = 1000


def timeit(label, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:44s} {best*1e3:9.1f} ms", flush=True)
    return out


def build_epoch(prob, cfg, C, chunk, logp_chunk, *, quantile="sort",
                sample="matmul", partition="matmul", logprob="full",
                resim="full", onehot_dtype=jnp.float32):
    """A copy of aglmcmc._epoch_update with ablation switches."""
    P = cfg.step_size * cfg.batch_size

    def one_epoch(key, pool_theta, pool_dis, pool_logq, hat_eps):
        k_sample, k_sim = jax.random.split(key)

        # (1) anneal
        if quantile == "sort":
            num_a = jnp.sum(pool_dis < hat_eps)
            q = jnp.clip(cfg.alpha * num_a / P, 0.0, 1.0)
            new_eps = jnp.maximum(jnp.quantile(pool_dis, q), cfg.hat_eps_T)
        elif quantile == "bisect":
            num_a = jnp.sum(pool_dis < hat_eps)
            q = jnp.clip(cfg.alpha * num_a / P, 0.0, 1.0)
            h = q * (P - 1)
            k = jnp.floor(h).astype(jnp.int32)
            bits = jax.lax.bitcast_convert_type(pool_dis, jnp.int32)

            def kth(kk):
                def body(c, _):
                    lo, hi = c
                    mid = (lo + hi) // 2
                    cnt = jnp.sum(bits <= mid)
                    take_lo = cnt >= kk + 1
                    return (jnp.where(take_lo, lo, mid + 1),
                            jnp.where(take_lo, mid, hi)), None

                (lo, _), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.int32(2**30 * 2 - 2)), None,
                    length=31)
                return jax.lax.bitcast_convert_type(lo, jnp.float32)

            v0, v1 = kth(k), kth(jnp.minimum(k + 1, P - 1))
            new_eps = jnp.maximum(v0 + (h - k) * (v1 - v0), cfg.hat_eps_T)
        else:  # "skip"
            new_eps = jnp.maximum(hat_eps * 0.9, cfg.hat_eps_T)
        hat_eps = jnp.where(hat_eps > cfg.hat_eps_T, new_eps, hat_eps)

        # (2) training weights
        train_log_k = prob.kernel_log_prob(pool_dis, hat_eps)
        train_log_w = (prob.prior_log_prob(pool_theta) + train_log_k
                       - pool_logq)
        train_w = jnp.exp(train_log_w)
        train_w = jnp.where(jnp.isnan(train_w), 0.0, train_w)

        # (3) KDE fit
        kde = KernelDensity.fit(pool_theta, train_w, bandwidth="silverman")

        # (4) oversampled redraw
        n_cand = cfg.oversample * P
        if sample == "matmul":
            cand = kde.sample(k_sample, n_cand, matmul_select=True)
        elif sample == "flat":
            k_idx, k_noise = jax.random.split(k_sample)
            cdf = jnp.cumsum(kde.weights)
            u = jax.random.uniform(k_idx, (n_cand,)) * cdf[-1]
            idx = jnp.clip(
                jnp.searchsorted(cdf, u, side="right",
                                 method="compare_all"), 0, P - 1)
            noise = (jax.random.normal(k_noise, (n_cand, kde.dim))
                     * kde.bandwidth)
            onehot = (idx[:, None] == jnp.arange(P)[None, :]).astype(
                jnp.float32)
            picked = jnp.dot(onehot, kde.X,
                             preferred_element_type=jnp.float32)
            cand = picked + noise
        elif sample == "blockedsearch_gather":
            from glabc_tpu.ops.resampling import blocked_searchsorted_take
            k_idx, k_noise = jax.random.split(k_sample)
            cdf = jnp.cumsum(kde.weights)
            u = jax.random.uniform(k_idx, (n_cand,)) * cdf[-1]
            _, idx = blocked_searchsorted_take(cdf, u, kde.X)
            noise = (jax.random.normal(k_noise, (n_cand, kde.dim))
                     * kde.bandwidth)
            cand = kde.X[idx] + noise
        elif sample == "bf16":
            k_idx, k_noise = jax.random.split(k_sample)
            cdf = jnp.cumsum(kde.weights)
            u = jax.random.uniform(k_idx, (n_cand,)) * cdf[-1]
            idx = jnp.clip(
                jnp.searchsorted(cdf, u, side="right",
                                 method="compare_all"), 0, P - 1)
            noise = (jax.random.normal(k_noise, (n_cand, kde.dim))
                     * kde.bandwidth)
            onehot = (idx[:, None] == jnp.arange(P)[None, :]).astype(
                jnp.bfloat16)
            picked = jnp.dot(onehot, kde.X.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            cand = picked + noise
        elif sample == "gather":
            cand = kde.sample(k_sample, n_cand, matmul_select=False)
        else:  # "skip"
            cand = jnp.tile(pool_theta, (cfg.oversample, 1))
        ok = prob.prior_log_prob(cand) > _PRIOR_CUTOFF
        if partition == "matmul":
            new_theta = stable_partition_take(cand, ok, P)
        elif partition == "blocked":
            from glabc_tpu.ops.resampling import (
                blocked_stable_partition_take)
            new_theta = blocked_stable_partition_take(cand, ok, P)
        elif partition == "bf16":
            n = ok.shape[0]
            n_ok = jnp.sum(ok)
            rank_ok = jnp.cumsum(ok) - 1
            rank_bad = jnp.cumsum(~ok) - 1
            dest = jnp.where(ok, rank_ok, n_ok + rank_bad)
            onehot = (jnp.arange(P, dtype=dest.dtype)[:, None]
                      == dest[None, :]).astype(jnp.bfloat16)
            new_theta = jnp.dot(onehot, cand.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
        else:  # "skip"
            new_theta = cand[:P]
        if logprob == "full":
            new_log_q = kde.log_prob(new_theta, support_chunk=logp_chunk)
        else:  # "skip"
            new_log_q = jnp.sum(new_theta, axis=-1) * 1e-6
        if resim == "full":
            new_pool = _pool_from_proposals(prob, k_sim, new_theta,
                                            new_log_q)
            out = (new_pool.theta, new_pool.dis, new_pool.log_q)
        else:  # "skip"
            out = (new_theta, new_log_q * 0 + 1.0, new_log_q)
        return out, kde.bandwidth, hat_eps

    vm = jax.vmap(one_epoch)
    if not (chunk and chunk < C):
        return jax.jit(vm)
    assert C % chunk == 0

    @jax.jit
    def epoch_fn(keys, pt, pd, pq, eps):
        def reblock(x):
            return x.reshape((C // chunk, chunk) + x.shape[1:])

        def unblock(x):
            return x.reshape((C,) + x.shape[2:])

        out = jax.lax.map(lambda a: vm(*a),
                          (reblock(keys), reblock(pt), reblock(pd),
                           reblock(pq), reblock(eps)))
        return jax.tree_util.tree_map(unblock, out)

    return epoch_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=32768)
    ap.add_argument("--pool", type=int, default=P_DEFAULT)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--logp-chunk", type=int, default=0)
    args = ap.parse_args()
    C, P = args.chains, args.pool
    prob = MixtureProblem(0.05)
    ip = DiagGaussian.create(2, 0.0, 0.0)
    cfg = AGLMCMCConfig(1.0, 5, P // 5, 0.8, 0.2, 4, 0, 0)
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.devices()[0].platform} C={C} P={P} "
          f"chunk={args.chunk} logp_chunk={args.logp_chunk}", flush=True)

    @jax.jit
    def init_pools(k):
        def one(kk):
            k1, k2 = jax.random.split(kk)
            th, log_q = ip.forward(k1, P)
            pl = _pool_from_proposals(prob, k2, th, log_q)
            return pl.theta, pl.dis, pl.log_q
        return jax.vmap(one)(jax.random.split(k, C))

    pt, pd, pq = init_pools(key)
    jax.block_until_ready(pt)
    keys = jax.random.split(key, C)
    eps = jnp.full((C,), 1.0e6, jnp.float32)

    def run(label, **kw):
        fn = build_epoch(prob, cfg, C, args.chunk, args.logp_chunk, **kw)
        timeit(label, fn, keys, pt, pd, pq, eps)

    import os
    only = os.environ.get("ABLATE_ONLY", "")
    variants = [
        ("flat sample + flat partition", dict(sample="flat")),
        ("blocked sample + flat partition", {}),
        ("flat sample + blocked partition",
         dict(sample="flat", partition="blocked")),
        ("blocked sample + blocked partition",
         dict(partition="blocked")),
        ("blockedsearch+gather sample",
         dict(sample="blockedsearch_gather")),
        ("blocked both, logprob skip",
         dict(partition="blocked", logprob="skip")),
        ("blocked both, sample skip",
         dict(sample="skip", partition="blocked")),
    ]
    for label, kw in variants:
        if only and only not in label:
            continue
        run(label, **kw)


if __name__ == "__main__":
    main()
