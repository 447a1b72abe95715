"""Fused AGLMCMC throughput benchmark (TPU).

End-to-end transitions/s including the adaptation epochs (epsilon
annealing + weighted-KDE refit + oversampled pool redraw on the XLA path)
— the honest number for the adaptive sampler, vs the reference's
single-chain Python loop (~2k it/s, BASELINE.md) and the repo's scan path.

Usage: nohup setsid python -u benchmarks/aglmcmc_bench.py > /tmp/agl.txt &
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.samplers.aglmcmc import run_aglmcmc
from glabc_tpu.samplers.aglmcmc_fused import run_aglmcmc_fused

PROB = MixtureProblem(0.05)
IP = DiagGaussian.create(2, 0.0, 0.0)
LP = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))


def bench_fused(C, num_ite, step_size=200, block_chains=1024,
                collect_history=True, epoch_chunk=0, epoch_logp_chunk=0,
                thin=1, history_dtype=None):
    key = jax.random.PRNGKey(0)
    # warm up compiles on a short run — step_size + 2 so ONE adaptation
    # epoch compiles too (step_size + 1 would skip it and the timed run
    # would include the epoch_fn compile)
    kw = dict(step_size=step_size, num_chains=C, block_chains=block_chains,
              collect_history=collect_history, epoch_chunk=epoch_chunk,
              epoch_logp_chunk=epoch_logp_chunk, thin=thin,
              history_dtype=history_dtype)
    run_aglmcmc_fused(PROB, key, step_size + 2, jnp.zeros(2), IP, **kw)
    # kernel+driver-only rate: one segment, no epoch
    t0 = time.perf_counter()
    run_aglmcmc_fused(PROB, key, step_size + 1, jnp.zeros(2), IP, **kw)
    seg_rate = C * step_size / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    res = run_aglmcmc_fused(PROB, key, num_ite, jnp.zeros(2), IP, **kw)
    dt = time.perf_counter() - t0
    trans = C * (num_ite - 1)
    burn = min(2 * step_size, (num_ite - 1) // 2) // max(1, thin)
    absmean = (np.abs(np.asarray(res.thetas[:, burn:, :], np.float64))
               .mean(axis=(0, 1)) if collect_history else None)
    acc = float(res.counts.global_accepts.sum()
                / max(res.counts.global_attempts.sum(), 1))
    return trans / dt, dt, absmean, acc, res.hat_eps.mean(), seg_rate


def bench_mixed(C, num_ite, step_size=200, gf=0.5, block_chains=1024,
                shared_support=1024):
    """gf<1 mixed kernel (in-kernel local move + resident shared KDE)."""
    key = jax.random.PRNGKey(0)
    kw = dict(global_frequency=gf, step_size=step_size, num_chains=C,
              block_chains=block_chains, shared_support=shared_support)
    seg_len = int(round(step_size / gf))
    run_aglmcmc_fused(PROB, key, seg_len + 2, jnp.zeros(2), IP, **kw)
    t0 = time.perf_counter()
    run_aglmcmc_fused(PROB, key, seg_len + 1, jnp.zeros(2), IP, **kw)
    seg_rate = C * seg_len / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    res = run_aglmcmc_fused(PROB, key, num_ite, jnp.zeros(2), IP, **kw)
    dt = time.perf_counter() - t0
    burn = min(2 * seg_len, (num_ite - 1) // 2)
    absmean = np.abs(res.thetas[:, burn:, :]).mean(axis=(0, 1))
    g_rate = float(res.counts.global_accepts.sum()
                   / max(res.counts.global_attempts.sum(), 1))
    l_rate = float(res.counts.local_accepts.sum()
                   / max(res.counts.local_attempts.sum(), 1))
    return (C * (num_ite - 1) / dt, dt, absmean, g_rate, l_rate,
            float(res.hat_eps), seg_rate)


def bench_stress(num_ite, step_size=200, collect_history=True,
                 thin=1, history_dtype=None):
    """The driver's config-5 stress shape: dim-8 HighDim mixture, 10,240
    chains, per-chain adaptation (chunked KDE refits) — the repo's worst
    round-3 number (87k trans/s end-to-end); tracks the one-hot-matmul
    epoch ops.  With history on the device->host tunnel (~30 MB/s) alone
    caps this config at ~0.9M trans/s (656 MB of d=8 history); pass
    --no-history for the compute-bound number."""
    from glabc_tpu.models.problems import HighDimMixtureProblem

    prob = HighDimMixtureProblem(dim=8, epsilon=0.25)
    ip = DiagGaussian.create(8, 0.0, 0.0)
    C = 10240
    key = jax.random.PRNGKey(0)
    kw = dict(step_size=step_size, num_chains=C, block_chains=1024,
              epoch_chunk=2048, epoch_logp_chunk=250,
              collect_history=collect_history, thin=thin,
              history_dtype=history_dtype)
    run_aglmcmc_fused(prob, key, step_size + 2, jnp.zeros(8), ip, **kw)
    t0 = time.perf_counter()
    res = run_aglmcmc_fused(prob, key, num_ite, jnp.zeros(8), ip, **kw)
    dt = time.perf_counter() - t0
    acc = float(res.counts.global_accepts.sum()
                / max(res.counts.global_attempts.sum(), 1))
    return C * (num_ite - 1) / dt, dt, acc, float(res.hat_eps.mean())


def bench_bigpool(C=131072, epochs=3, step_size=200, pack_chunk=25):
    """131k chains x 1000-slot pools (the round-3 HBM ceiling): gf=1 fused
    with pack_chunk sub-segment packing so only a slice of the pool is ever
    in the kernel layout; history off (the transfer would dominate at
    ~30 MB/s through the tunnel — throughput is the metric here)."""
    key = jax.random.PRNGKey(0)
    num_ite = 1 + epochs * step_size
    kw = dict(step_size=step_size, num_chains=C, block_chains=2048,
              epoch_chunk=512, epoch_logp_chunk=250, collect_history=False,
              pack_chunk=pack_chunk)
    run_aglmcmc_fused(PROB, key, step_size + 2, jnp.zeros(2), IP, **kw)
    t0 = time.perf_counter()
    res = run_aglmcmc_fused(PROB, key, num_ite, jnp.zeros(2), IP, **kw)
    dt = time.perf_counter() - t0
    acc = float(res.counts.global_accepts.sum()
                / max(res.counts.global_attempts.sum(), 1))
    return C * (num_ite - 1) / dt, dt, acc, float(res.hat_eps.mean())


def bench_scan(C, num_ite, step_size=200, epoch_chunk=1024):
    key = jax.random.PRNGKey(0)
    ec = min(C, epoch_chunk)
    run_aglmcmc(PROB, key, step_size + 2, jnp.zeros(2), LP, IP,
                global_frequency=1.0, step_size=step_size, num_chains=C,
                epoch_chunk=ec)
    t0 = time.perf_counter()
    run_aglmcmc(PROB, key, num_ite, jnp.zeros(2), LP, IP,
                global_frequency=1.0, step_size=step_size, num_chains=C,
                epoch_chunk=ec)
    dt = time.perf_counter() - t0
    return C * (num_ite - 1) / dt, dt


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="fused",
                    choices=["fused", "scan", "both", "mixed", "stress",
                             "bigpool"])
    ap.add_argument("--chains", type=int, nargs="+",
                    default=[4096, 16384, 32768])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--step-size", type=int, default=200)
    ap.add_argument("--no-history", action="store_true")
    ap.add_argument("--epoch-chunk", type=int, default=0)
    ap.add_argument("--logp-chunk", type=int, default=0)
    ap.add_argument("--thin", type=int, default=1)
    ap.add_argument("--history-dtype", default=None)
    args = ap.parse_args()
    num_ite = 1 + args.epochs * args.step_size
    print(f"backend={jax.devices()[0].platform} epochs={args.epochs} "
          f"step_size={args.step_size}")
    if args.mode == "stress":
        rate, dt, acc, eps = bench_stress(
            num_ite, args.step_size,
            collect_history=not args.no_history, thin=args.thin,
            history_dtype=args.history_dtype)
        print(f"stress d=8 C=10240: {rate/1e6:9.2f}M trans/s end-to-end "
              f"({dt:.2f}s) acc={acc:.3f} hat_eps={eps:.3f}")
        raise SystemExit(0)
    if args.mode == "bigpool":
        rate, dt, acc, eps = bench_bigpool(epochs=args.epochs,
                                           step_size=args.step_size)
        print(f"bigpool C=131072 pack_chunk=25: {rate/1e6:9.1f}M trans/s "
              f"end-to-end ({dt:.2f}s) acc={acc:.3f} hat_eps={eps:.3f}")
        raise SystemExit(0)
    for C in args.chains:
        if args.mode in ("fused", "both"):
            # per-chain epoch peak is the (chunk, P, P) KDE log_prob
            # intermediate (~4 MB/chain at P=1000): chunk to ~4 GB HBM
            ec = args.epoch_chunk or min(C, 1024)
            rate, dt, absmean, acc, eps, seg_rate = bench_fused(
                C, num_ite, args.step_size,
                collect_history=not args.no_history, epoch_chunk=ec,
                epoch_logp_chunk=args.logp_chunk, thin=args.thin,
                history_dtype=args.history_dtype)
            print(f"fused  C={C:7d}: {rate/1e6:9.1f}M trans/s end-to-end "
                  f"({dt:.2f}s), {seg_rate/1e6:9.1f}M kernel-segment  "
                  f"acc={acc:.3f} hat_eps={eps:.3f} absmean={absmean}")
        if args.mode == "mixed":
            seg_len = int(round(args.step_size / 0.5))
            n_ite = 1 + args.epochs * seg_len
            rate, dt, absmean, g_r, l_r, eps, seg_rate = bench_mixed(
                C, n_ite, args.step_size)
            print(f"mixed  C={C:7d}: {rate/1e6:9.1f}M trans/s end-to-end "
                  f"({dt:.2f}s), {seg_rate/1e6:9.1f}M kernel-segment  "
                  f"g_acc={g_r:.3f} l_acc={l_r:.3f} hat_eps={eps:.3f} "
                  f"absmean={absmean}")
        if args.mode in ("scan", "both") and C == args.chains[0]:
            rate, dt = bench_scan(min(C, 4096), num_ite, args.step_size)
            print(f"scan   C={min(C, 4096):7d}: {rate/1e6:9.2f}M trans/s  ({dt:.2f}s)")
