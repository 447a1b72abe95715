"""Run glabc_tpu's GLMALA / GLMCMC-NF / AGLMCMC at the reference's canonical
configs and emit summary JSONs in the exact format of
``benchmarks/ref_runs/run_reference.py`` (VERDICT round-1 item 3).

Canonical hyperparameters (reference ``examples/Mixture.py:72-79``):
  glmala:  gf=0.8, ip=std-normal DiagGaussian, batch=5, tau=0.3, num_grad=100
  nf:      gf=0.5, lp=DiagGaussian(0, log 0.35), batch=5, S=200, train=50
  aglmcmc: gf=1, batch=5, S=200, alpha=0.8, eps_T=0.2

The reference is a single chain; we run C chains x (num_ite) and report both
the pooled summary and the per-chain spread, at >= the reference's 200k total
samples.  Scan paths only (the reference-exact semantics); fused-kernel
numbers live in PARITY_RESULTS.md separately.

Usage: python benchmarks/ours_parity.py {glmala|nf|aglmcmc|all} [--chains C]
       [--num-ite N] [--seed S]
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.samplers.aglmcmc import run_aglmcmc
from glabc_tpu.samplers.glmala import run_glmala
from glabc_tpu.samplers.glmcmc_nf import run_glmcmc_nf


def summarize(thetas, label, wall_s, num_ite):
    """Same statistics as ref_runs/run_reference.py::summarize, pooled over
    chains, plus the per-chain spread of the headline moments."""
    th = np.asarray(thetas, dtype=np.float64)  # (C, T, d)
    C, T, d = th.shape
    flat = th.reshape(-1, d)
    delta = th[:, 1:] - th[:, :-1]
    moved = (np.abs(delta).sum(axis=2) > 0).mean()

    def chain_esjd(dth):
        return np.linalg.det(dth.T @ dth / (T - 1)) ** (1.0 / d)

    esjds = np.array([chain_esjd(delta[c]) for c in range(C)])
    per_chain_absmean = np.abs(th).mean(axis=1)  # (C, d)
    out = {
        "label": label,
        "num_chains": int(C),
        "num_samples": int(flat.shape[0]),
        "mean": flat.mean(axis=0).tolist(),
        "absmean": np.abs(flat).mean(axis=0).tolist(),
        "var": flat.var(axis=0, ddof=1).tolist(),
        "move_frac": float(moved),
        "esjd": float(esjds.mean()),
        "esjd_chain_std": float(esjds.std()),
        "absmean_chain_range": [
            per_chain_absmean.min(axis=0).tolist(),
            per_chain_absmean.max(axis=0).tolist(),
        ],
        "wall_s": round(wall_s, 1),
        "transitions_per_s": round(C * num_ite / wall_s, 1),
    }
    # second-half stats: the reference's 200k-iteration runs are dominated by
    # the post-adaptation regime; short multi-chain runs are not, so the
    # fairer comparison for the adaptive samplers is the second half.
    half = th[:, T // 2:]
    hflat = half.reshape(-1, d)
    hdelta = half[:, 1:] - half[:, :-1]
    out["second_half"] = {
        "absmean": np.abs(hflat).mean(axis=0).tolist(),
        "var": hflat.var(axis=0, ddof=1).tolist(),
        "move_frac": float((np.abs(hdelta).sum(axis=2) > 0).mean()),
        "esjd": float(np.mean([
            np.linalg.det(hdelta[c].T @ hdelta[c] / (hdelta.shape[1])) ** (1.0 / d)
            for c in range(C)
        ])),
    }
    print(json.dumps(out))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("which", choices=["glmala", "nf", "aglmcmc", "all"])
    p.add_argument("--chains", type=int, default=0)
    p.add_argument("--num-ite", type=int, default=0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    prob = MixtureProblem(epsilon=0.05)
    theta0 = jnp.zeros(2)
    lp = DiagGaussian.create(2, 0.0, float(np.log(0.35)))
    ip = DiagGaussian.create(2, 0.0, 0.0)
    outdir = os.path.join(HERE, "ref_runs", "out")
    os.makedirs(outdir, exist_ok=True)

    jobs = (["glmala", "nf", "aglmcmc"] if args.which == "all"
            else [args.which])
    for which in jobs:
        key = jax.random.PRNGKey(args.seed)
        if which == "glmala":
            C = args.chains or 64
            N = args.num_ite or 12800
            t0 = time.time()
            res = run_glmala(prob, key, N, theta0, ip, global_frequency=0.8,
                             batch_size=5, tau=0.3, num_grad=100,
                             num_chains=C, segment_size=min(N, 1600))
        elif which == "nf":
            C = args.chains or 64
            N = args.num_ite or 12800
            t0 = time.time()
            res = run_glmcmc_nf(prob, key, N, theta0, lp,
                                global_frequency=0.5, batch_size=5,
                                step_size=200, train_steps=50, num_chains=C)
        else:
            C = args.chains or 64
            N = args.num_ite or 25600
            t0 = time.time()
            res = run_aglmcmc(prob, key, N, theta0, lp, ip,
                              global_frequency=1.0, batch_size=5,
                              step_size=200, alpha=0.8, hat_eps_T=0.2,
                              num_chains=C)
        wall = time.time() - t0
        label = f"glabc_tpu {which} seed={args.seed} chains={C} num_ite={N}"
        out = summarize(res.thetas, label, wall, N)
        if which == "aglmcmc" and res.hat_eps_hist is not None:
            out["hat_eps_path"] = [
                float(np.mean(e)) for e in res.hat_eps_hist
            ]
        with open(os.path.join(outdir, f"ours_{which}_seed{args.seed}.json"),
                  "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
