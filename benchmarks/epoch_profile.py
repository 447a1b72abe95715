"""Micro-profile of the AGLMCMC per-chain adaptation epoch on TPU.

The end-to-end adaptive throughput is epoch-bound; this breaks one epoch
into its component ops (quantile/anneal, KDE fit, KDE sample, oversample
argsort filter, KDE log_prob, pool re-simulation) and times each at a given
chain count so the slow op is identifiable.

Usage: python benchmarks/epoch_profile.py [--chains 4096] [--pool 1000]
"""

import argparse
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.models.kde import KernelDensity
from glabc_tpu.samplers.aglmcmc import (
    AGLMCMCConfig,
    _pool_from_proposals,
    make_epoch_fn,
)


def timeit(label, fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:36s} {best*1e3:9.1f} ms", flush=True)
    return out


def shared_main(args):
    """Break down the SHARED adaptation epoch (`_shared_epoch_update`):
    one cross-chain quantile + resampled-support KDE + per-chain redraws
    from the shared KDE (the gf<1 mixed path's epoch)."""
    from glabc_tpu.ops.resampling import (
        stable_partition_indices,
        systematic_resample,
    )
    from glabc_tpu.samplers.aglmcmc import make_shared_epoch_fn

    C, P, S = args.chains, args.pool, args.support
    prob = MixtureProblem(0.05)
    ip = DiagGaussian.create(2, 0.0, 0.0)
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.devices()[0].platform} SHARED C={C} P={P} S={S} "
          f"redraw_chunk={args.chunk}", flush=True)

    @jax.jit
    def init_pools(k):
        def one(kk):
            k1, k2 = jax.random.split(kk)
            th, log_q = ip.forward(k1, P)
            return _pool_from_proposals(prob, k2, th, log_q)
        return jax.vmap(one)(jax.random.split(k, C))

    pools = timeit("init_pools (sim+weight)", init_pools, key)
    hat_eps = jnp.float32(1.0e6)
    cfg = AGLMCMCConfig(0.5, B_GLOBAL, P // B_GLOBAL, 0.8, 0.2, 4, 0, 0)
    epoch = make_shared_epoch_fn(prob, cfg, S, redraw_chunk=args.chunk)
    timeit("FULL shared epoch", epoch, key, pools, hat_eps)

    # --- components
    @jax.jit
    def quantile(pools_):
        dis = pools_.dis.reshape(-1)
        return jnp.quantile(dis, 0.8)

    timeit(f"shared quantile {C*P}", quantile, pools)

    @jax.jit
    def resample_support(pools_, k):
        w = jnp.exp(pools_.log_w)
        w = jnp.where(jnp.isnan(w), 0.0, w)
        w = w / jnp.sum(w)
        idx = systematic_resample(k, w.reshape(-1), S)
        return pools_.theta[idx // P, idx % P]

    support = timeit(f"resample+gather support {S}", resample_support,
                     pools, key)
    kde = KernelDensity.fit(support, None, bandwidth="silverman")
    kde = jax.tree_util.tree_map(jnp.asarray, kde)

    Cs = min(C, args.chunk)
    keys_s = jax.random.split(key, Cs)

    @jax.jit
    def sample(ks):
        return jax.vmap(lambda k: kde.sample(k, 4 * P))(ks)

    cand = timeit(f"shared-KDE sample 4P x{Cs}", sample, keys_s)

    @jax.jit
    def prior_filter(cand_):
        def one(cc):
            ok = prob.prior_log_prob(cc) > np.log(1e-10)
            order = stable_partition_indices(ok)
            return cc[order[:P]]
        return jax.vmap(one)(cand_)

    new_theta = timeit(f"prior filter x{Cs}", prior_filter, cand)

    @jax.jit
    def logprob(th):
        return jax.vmap(kde.log_prob)(th)

    timeit(f"shared-KDE log_prob PxS x{Cs}", logprob, new_theta)

    @jax.jit
    def resim(th, ks):
        return jax.vmap(
            lambda t, k: _pool_from_proposals(prob, k, t, jnp.zeros(P))
        )(th, ks)

    timeit(f"pool re-sim x{Cs}", resim, new_theta, keys_s)


B_GLOBAL = 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=4096)
    ap.add_argument("--pool", type=int, default=1000)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--support", type=int, default=4096)
    ap.add_argument("--shared", action="store_true")
    args = ap.parse_args()
    if args.shared:
        shared_main(args)
        return
    C, P = args.chains, args.pool
    B = 5
    prob = MixtureProblem(0.05)
    ip = DiagGaussian.create(2, 0.0, 0.0)
    key = jax.random.PRNGKey(0)
    print(f"backend={jax.devices()[0].platform} C={C} P={P} "
          f"chunk={args.chunk}", flush=True)

    @jax.jit
    def init_pools(k):
        def one(kk):
            k1, k2 = jax.random.split(kk)
            th, log_q = ip.forward(k1, P)
            return _pool_from_proposals(prob, k2, th, log_q)
        return jax.vmap(one)(jax.random.split(k, C))

    pools = timeit("init_pools (sim+weight)", init_pools, key)
    hat_eps = jnp.full((C,), 1.0e6, jnp.float32)
    keys = jax.random.split(key, C)

    # --- full epoch (epoch_fn donates pools/hat_eps: feed copies per call)
    cfg = AGLMCMCConfig(1.0, B, P // B, 0.8, 0.2, 4, 0, 0)
    epoch = make_epoch_fn(prob, cfg, C, min(args.chunk, C))

    def epoch_fresh():
        p = jax.tree_util.tree_map(lambda x: x.copy(), pools)
        return epoch(keys, p, hat_eps.copy())

    timeit("FULL epoch (chunked)", epoch_fresh)

    # --- components, vmapped unchunked at a size that fits
    Cs = min(C, args.chunk)
    sub = jax.tree_util.tree_map(lambda x: x[:Cs], pools)
    keys_s = keys[:Cs]

    @jax.jit
    def quantile_anneal(pools_, eps):
        def one(dis, e):
            num_a = jnp.sum(dis < e)
            q = jnp.clip(0.8 * num_a / P, 0.0, 1.0)
            return jnp.maximum(jnp.quantile(dis, q), 0.2)
        return jax.vmap(one)(pools_.dis, eps)

    timeit(f"anneal quantile x{Cs}", quantile_anneal, sub, hat_eps[:Cs])

    @jax.jit
    def fit(pools_):
        w = jnp.exp(pools_.log_w)
        return jax.vmap(lambda th, ww: KernelDensity.fit(th, ww))(
            pools_.theta, w)

    kdes = timeit(f"KDE fit x{Cs}", fit, sub)

    @jax.jit
    def sample(kdes_, ks):
        return jax.vmap(lambda kd, k: kd.sample(k, 4 * P))(kdes_, ks)

    cand = timeit(f"KDE sample 4P x{Cs}", sample, kdes, keys_s)

    @jax.jit
    def prior_filter(cand_):
        def one(cc):
            ok = prob.prior_log_prob(cc) > np.log(1e-10)
            order = jnp.argsort(~ok, stable=True)
            return cc[order[:P]]
        return jax.vmap(one)(cand_)

    new_theta = timeit(f"prior filter argsort x{Cs}", prior_filter, cand)

    @jax.jit
    def logprob(kdes_, th):
        return jax.vmap(lambda kd, x: kd.log_prob(x))(kdes_, th)

    timeit(f"KDE log_prob P x{Cs}", logprob, kdes, new_theta)

    @jax.jit
    def resim(th, ks):
        return jax.vmap(
            lambda t, k: _pool_from_proposals(prob, k, t, jnp.zeros(P))
        )(th, ks)

    timeit(f"pool re-sim x{Cs}", resim, new_theta, keys_s)


if __name__ == "__main__":
    main()
