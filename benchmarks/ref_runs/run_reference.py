"""Drive the reference (/root/reference) samplers at their canonical configs
to generate full-length parity numbers (VERDICT round-1 item 3).

Canonical hyperparameters from /root/reference/glabcmcmc/examples/Mixture.py:72-79:
  glmala:  gf=0.8, ip=std-normal DiagGaussian, batch=5, tau=0.3, num_grad=100
  nf:      gf=0.5, lp=DiagGaussian(0, log 0.35), base=nf.DiagGaussian(2), batch=5,
           step_size=200, train_steps=50
  aglmcmc: gf=1, lp, ip=std-normal, batch=5, step_size=200, alpha=0.8, eps_T=0.2

Notes:
- normflows is not installed; benchmarks/ref_runs/nf_shim.py reimplements the
  exact subset the reference uses (see its docstring).
- The reference AGLMCMC hard-crashes past 10,000 iterations: its chain buffer
  is `torch.zeros(10000, theta_dim)` regardless of num_ite
  (/root/reference/glabcmcmc/AGLMCMC.py:117, SURVEY quirk 1).  To run the
  200k-iteration parity chain we exec the reference source with ONLY that
  literal patched to `num_ite` — no other change.  AGLMCMC also returns None,
  so its chain is recovered from the CSV it writes.

Usage: python run_reference.py {glmala|nf|aglmcmc} NUM_ITE [SEED]
"""

import json
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np
import torch

torch.set_num_threads(1)

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, "/root/reference")
sys.path.insert(0, HERE)

import nf_shim

sys.modules["normflows"] = nf_shim.make_shim()

from glabcmcmc import distribution  # noqa: E402
from glabcmcmc.ESJD import esjd  # noqa: E402
from glabcmcmc.examples.Mixture import Mixture_set  # noqa: E402


def make_patched_aglmcmc():
    """Exec the reference AGLMCMC with only the 10k buffer literal fixed."""
    src_path = "/root/reference/glabcmcmc/AGLMCMC.py"
    with open(src_path) as f:
        src = f.read()
    patched = src.replace(
        "torch.zeros(10000, ABCset.theta_dim)",
        "torch.zeros(num_ite, ABCset.theta_dim)",
    )
    assert patched != src, "buffer literal not found — reference changed?"
    ns = {"__name__": "aglmcmc_patched", "__file__": src_path}
    exec(compile(patched, src_path, "exec"), ns)
    return ns["AGLMCMC"]


def summarize(chain, label):
    th = np.asarray(chain, dtype=np.float64)
    d = th.shape[1]
    delta = th[1:] - th[:-1]
    moved = (np.abs(delta).sum(axis=1) > 0).mean()
    out = {
        "label": label,
        "num_samples": int(th.shape[0]),
        "mean": th.mean(axis=0).tolist(),
        "absmean": np.abs(th).mean(axis=0).tolist(),
        "var": th.var(axis=0, ddof=1).tolist(),
        "move_frac": float(moved),
        "esjd": float(
            np.linalg.det(delta.T @ delta / (th.shape[0] - 1)) ** (1.0 / d)
        ),
    }
    return out


def main():
    which = sys.argv[1]
    num_ite = int(sys.argv[2])
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    torch.manual_seed(seed)
    np.random.seed(seed)

    model = Mixture_set(epsilon=0.05)
    theta0 = torch.tensor([0.0, 0.0])
    y0 = model.generate_samples(theta0)
    lp = distribution.DiagGaussian(
        2, loc=torch.zeros(1, 2), log_scale=torch.log(torch.tensor([0.35, 0.35]))
    )
    ip = distribution.DiagGaussian(
        2, torch.tensor([0.0, 0.0]), torch.tensor([0.0, 0.0])
    )

    outdir = os.path.join(HERE, "out")
    os.makedirs(outdir, exist_ok=True)
    csv_path = os.path.join(outdir, f"ref_{which}_seed{seed}.csv")
    if os.path.exists(csv_path):
        os.remove(csv_path)

    t0 = time.time()
    if which == "glmala":
        from glabcmcmc.GLMALA import GLMALA

        chain = GLMALA(
            ABCset=model, num_ite=num_ite, Initial_theta=theta0, Initial_y=y0,
            tau=0.3, num_grad=100, filelocation=csv_path, global_frequency=0.8,
            Importance_Proposal=ip, batch_size=5,
        )
        chain = chain.detach().numpy()
    elif which == "nf":
        import normflows as nf
        from glabcmcmc.GLMCMC_NFs import GLMCMC_NF

        base = nf.distributions.base.DiagGaussian(2)
        chain = GLMCMC_NF(
            ABCset=model, num_ite=num_ite, Initial_theta=theta0, Initial_y=y0,
            Local_Proposal=lp, filelocation=csv_path, global_frequency=0.5,
            step_size=200, batch_size=5, base=base, Train_step=50,
        )
        chain = chain.detach().numpy()
    elif which == "aglmcmc":
        AGLMCMC = make_patched_aglmcmc()
        ret = AGLMCMC(
            ABCset=model, num_ite=num_ite, Initial_theta=theta0, Initial_y=y0,
            Local_Proposal=lp, Initial_ISIR_prop=ip, filelocation=csv_path,
            global_frequency=1.0, step_size=200, batch_size=5, alpha=0.8,
            hat_eps_T=0.2,
        )
        assert ret is None  # reference quirk: AGLMCMC returns None
        chain = np.loadtxt(csv_path, delimiter=",")
    else:
        raise SystemExit(f"unknown sampler {which}")
    wall = time.time() - t0

    summary = summarize(chain, f"reference {which} seed={seed} num_ite={num_ite}")
    summary["wall_s"] = round(wall, 1)
    summary["it_per_s"] = round(num_ite / wall, 2)
    ch = torch.tensor(np.asarray(chain), dtype=torch.float32)
    summary["esjd_ref_impl"] = float(esjd(ch))
    out_path = os.path.join(outdir, f"ref_{which}_seed{seed}.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
