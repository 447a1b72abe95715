"""Trace plot + posterior density contour for a GLMCMC results CSV.

Parity with reference ``glabcmcmc/examples/plot.py:8-67``: a trace scatter
over an iteration window with point size proportional to visit count plus
the path line, and a full-chain KDE contour; saved as PDFs.

Usage: python examples/plot.py [results/glmcmc_results.csv]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import sys

import numpy as np


def make_plots(data, trace_path, posterior_path, lo=30_000, hi=40_000,
               title=""):
    """Save the reference pair of figures for one chain: a trace scatter
    with point size ~ visit count + path line over ``[lo, hi)``
    (``plot.py:8-38``) and a full-chain posterior density contour
    (``:40-67``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.asarray(data)
    lo = min(lo, max(0, len(data) - 10_000))
    hi = min(hi, len(data))
    window = data[lo:hi]

    pts, counts = np.unique(window, axis=0, return_counts=True)
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.plot(window[:, 0], window[:, 1], lw=0.3, color="gray", alpha=0.5,
            zorder=1)
    ax.scatter(pts[:, 0], pts[:, 1], s=2 + 3 * counts, c="C0", alpha=0.7,
               zorder=2)
    ax.set_xlabel(r"$\theta_1$")
    ax.set_ylabel(r"$\theta_2$")
    ax.set_title(f"{title} trace, iterations {lo}-{hi}".strip())
    fig.savefig(trace_path, bbox_inches="tight")
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 6))
    try:
        import seaborn as sns
        sns.kdeplot(x=data[:, 0], y=data[:, 1], fill=True, cmap="Blues",
                    ax=ax, levels=10)
    except ImportError:
        h, xe, ye = np.histogram2d(data[:, 0], data[:, 1], bins=60)
        ax.contourf(0.5 * (xe[:-1] + xe[1:]), 0.5 * (ye[:-1] + ye[1:]),
                    h.T, levels=10, cmap="Blues")
    ax.set_xlabel(r"$\theta_1$")
    ax.set_ylabel(r"$\theta_2$")
    ax.set_title(f"{title} posterior density".strip())
    fig.savefig(posterior_path, bbox_inches="tight")
    plt.close(fig)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "results/glmcmc_results.csv"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 40_000
    data = np.loadtxt(path, delimiter=",")
    make_plots(data, "traceplot_GLMCMC.pdf", "posteriorGLMCMC_fill.pdf",
               lo, hi)
    print("saved traceplot_GLMCMC.pdf, posteriorGLMCMC_fill.pdf")


if __name__ == "__main__":
    main()
