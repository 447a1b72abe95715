"""Cross-implementation check: Marjoram ABC-MCMC vs GLMCMC on the Mixture.

The reference validates itself against an independent implementation — R
EasyABC's ``ABC_mcmc(method="Marjoram")`` — and commits the evidence
(``/root/reference/glabcmcmc/examples/easyabc_Marjoram.R:1-17`` plus
``traceplot_easyabc_Marjoram.pdf`` / ``posterior_easyabc_Marjoram_fill.pdf``).
This script reproduces that check entirely inside this framework: the
Marjoram algorithm (plain RW ABC-MCMC with the uniform indicator kernel,
exactly what EasyABC runs) is an *algorithmically independent* sampler — no
iSIR, no Gaussian kernel, no global moves — so agreement of its posterior
with GLMCMC's is a genuine cross-check of both the problem DSL and the
GLMCMC kernel.

Writes the moments table + the two figure pairs (GLMCMC and Marjoram trace +
posterior contour, reference ``plot.py:8-67`` format) into
``examples/out/``.  ``tests/test_examples.py::test_marjoram_crosscheck_*``
asserts the agreement within MC error.

Usage: python examples/marjoram_crosscheck.py --num-ite 100000 --chains 16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.samplers import run_glmcmc

from marjoram import MarjoramMixture  # noqa: E402
from plot import make_plots  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "out")


def run_both(num_ite: int, chains: int, marjoram_eps: float, seed: int,
             matched: bool = False):
    """``matched=False``: the two historical runs (Marjoram indicator at
    ``marjoram_eps`` vs canonical GLMCMC Gaussian at 0.05 — DIFFERENT
    smoothed targets, compare loosely).  ``matched=True``: GLMCMC runs with
    the SAME indicator kernel at the SAME epsilon as Marjoram — identical
    smoothed target, so only the Markov kernels differ (iSIR+RW mixture vs
    pure RW) and the agreement tolerance can be MC-error tight."""
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
    ip = DiagGaussian.create(2, 0.0, 0.0)

    # Marjoram: uniform kernel, local-only RW (EasyABC semantics); start at
    # the observation so the indicator kernel accepts the initial state.
    marj = MarjoramMixture(epsilon=marjoram_eps)
    res_m = run_glmcmc(marj, jax.random.PRNGKey(seed), num_ite,
                       jnp.array([1.5, 1.5]), ip, lp, global_frequency=0.0,
                       batch_size=1, y0=marj.y_obs, num_chains=chains,
                       segment_size=min(num_ite, 50_000))

    if matched:
        # GLMCMC on the *same* indicator-kernel target (start at the
        # observation like Marjoram: the indicator needs dis <= eps at init)
        res_g = run_glmcmc(marj, jax.random.PRNGKey(seed + 1), num_ite,
                           jnp.array([1.5, 1.5]), ip, lp,
                           global_frequency=0.9, batch_size=5,
                           y0=marj.y_obs, num_chains=chains,
                           segment_size=min(num_ite, 50_000))
    else:
        # GLMCMC: canonical Gaussian-kernel config (reference Mixture.py:73)
        prob = MixtureProblem(0.05)
        res_g = run_glmcmc(prob, jax.random.PRNGKey(seed + 1), num_ite,
                           jnp.zeros(2), ip, lp, global_frequency=0.9,
                           batch_size=5, num_chains=chains,
                           segment_size=min(num_ite, 50_000))
    return res_m, res_g


def moments(thetas, burn_frac=0.2):
    num_ite = thetas.shape[1]
    flat = (np.asarray(thetas)[:, int(burn_frac * num_ite):]
            .reshape(-1, thetas.shape[-1]).astype(np.float64))
    return (np.abs(flat).mean(0), flat.mean(0), flat.var(0))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-ite", type=int, default=100_000)
    p.add_argument("--chains", type=int, default=16)
    p.add_argument("--marjoram-eps", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    os.makedirs(OUT, exist_ok=True)
    res_m, res_g = run_both(args.num_ite, args.chains, args.marjoram_eps,
                            args.seed)
    _, res_gm = run_both(args.num_ite, args.chains, args.marjoram_eps,
                         args.seed, matched=True)

    m_am, m_mean, m_var = moments(res_m.thetas)
    g_am, g_mean, g_var = moments(res_g.thetas)
    gm_am, gm_mean, gm_var = moments(res_gm.thetas)
    m_acc = float(res_m.acceptance_rates()["local"].mean())
    g_acc = float(res_g.acceptance_rates()["overall"].mean())
    gm_acc = float(res_gm.acceptance_rates()["overall"].mean())

    lines = [
        "# Marjoram vs GLMCMC cross-check",
        "",
        f"Config: num_ite={args.num_ite}, chains={args.chains}, "
        f"Marjoram eps={args.marjoram_eps} (uniform kernel), GLMCMC "
        f"eps=0.05 (Gaussian kernel, gf=0.9, B=5); burn-in 20%; seed "
        f"{args.seed}.",
        "",
        "Reference artifacts this reproduces: `easyabc_Marjoram.R` + "
        "`traceplot_easyabc_Marjoram.pdf` / "
        "`posterior_easyabc_Marjoram_fill.pdf` "
        "(/root/reference/glabcmcmc/examples/).",
        "",
        "| statistic | Marjoram (indicator) | GLMCMC matched "
        f"(indicator eps={args.marjoram_eps}) | GLMCMC (Gaussian 0.05) |",
        "|---|---|---|---|",
        f"| E\\|theta\\| per dim | {m_am[0]:.4f}, {m_am[1]:.4f} "
        f"| {gm_am[0]:.4f}, {gm_am[1]:.4f} "
        f"| {g_am[0]:.4f}, {g_am[1]:.4f} |",
        f"| E theta per dim | {m_mean[0]:.4f}, {m_mean[1]:.4f} "
        f"| {gm_mean[0]:.4f}, {gm_mean[1]:.4f} "
        f"| {g_mean[0]:.4f}, {g_mean[1]:.4f} |",
        f"| Var theta per dim | {m_var[0]:.4f}, {m_var[1]:.4f} "
        f"| {gm_var[0]:.4f}, {gm_var[1]:.4f} "
        f"| {g_var[0]:.4f}, {g_var[1]:.4f} |",
        f"| acceptance | {m_acc:.4f} | {gm_acc:.4f} | {g_acc:.4f} |",
        "",
        "**Matched smoothing** (columns 1-2): both runs target the SAME "
        "smoothed posterior (indicator kernel, same epsilon); only the "
        "Markov kernels differ (pure RW vs iSIR+RW mixture), so E|theta| "
        "must agree to MC error (asserted <= 0.03 in "
        "tests/test_examples.py).  The Gaussian-0.05 column is the "
        "canonical GLMCMC target — a DIFFERENT smoothing, compared "
        "loosely (the historical check).",
        "",
        "**Mode coverage**: Marjoram's local-only RW cannot hop the 4 "
        "sign-symmetric modes (the reference's own EasyABC posterior "
        "figure shows one mode), while GLMCMC's global moves visit all "
        "four — E theta differs by design (~1.4 vs ~0) and Var theta "
        "differs accordingly; E|theta| is the mode-invariant statistic "
        "compared above.",
    ]
    table = "\n".join(lines) + "\n"
    with open(os.path.join(OUT, "marjoram_crosscheck.md"), "w") as f:
        f.write(table)
    print(table)

    lo, hi = 30_000, 40_000
    make_plots(np.asarray(res_g.thetas)[0],
               os.path.join(OUT, "traceplot_GLMCMC.pdf"),
               os.path.join(OUT, "posteriorGLMCMC_fill.pdf"),
               lo, hi, title="GLMCMC")
    make_plots(np.asarray(res_m.thetas)[0],
               os.path.join(OUT, "traceplot_marjoram.pdf"),
               os.path.join(OUT, "posterior_marjoram_fill.pdf"),
               lo, hi, title="Marjoram")
    print(f"saved figures + table in {OUT}")


if __name__ == "__main__":
    main()
