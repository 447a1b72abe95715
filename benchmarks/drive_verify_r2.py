"""End-to-end drive for the round-2 checkpoint/IO fixes (real TPU).

1. Canonical GLMCMC drive with parity bands (verify skill recipe).
2. Fused GLMCMC resume with a BARE checkpoint path (no .npz): run the first
   half, then resume the second half and compare bitwise against one
   uninterrupted run — exercises carry_path normalization, atomic save,
   and the config-metadata validation added this round.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from glabc_tpu import DiagGaussian, MixtureProblem
from glabc_tpu.samplers import run_glmcmc
from glabc_tpu.samplers.glmcmc_fused import run_glmcmc_fused

prob = MixtureProblem(0.05)

# ---- 1. canonical drive
ip = DiagGaussian.create(2, 0.0, 0.0)
lp = DiagGaussian.create(2, 0.0, jnp.log(0.35))
res = run_glmcmc(prob, jax.random.PRNGKey(0), 5000, jnp.zeros(2), ip, lp,
                 0.9, 5, num_chains=64, segment_size=5000)
ch = res.thetas.reshape(-1, 2).astype(np.float64)
am, v = np.abs(ch).mean(0), ch.var(0)
print("absmean", am, "var", v)
assert all(1.40 <= x <= 1.50 for x in am), am
assert all(1.95 <= x <= 2.25 for x in v), v

# ---- 2. fused resume round-trip, bare path
key = jax.random.PRNGKey(1)
kw = dict(num_chains=2048, steps_per_call=128, block_chains=512,
          collect_history=True, seed=77)
full = run_glmcmc_fused(prob, key, 513, jnp.zeros(2), **kw)

with tempfile.TemporaryDirectory() as td:
    bare = os.path.join(td, "ck")  # no .npz: the ADVICE r1 failure mode
    first = run_glmcmc_fused(prob, key, 257, jnp.zeros(2),
                             checkpoint_path=bare, **kw)
    assert os.path.exists(bare + ".npz"), os.listdir(td)
    second = run_glmcmc_fused(prob, key, 513, jnp.zeros(2),
                              checkpoint_path=bare, resume=True, **kw)
    joined = np.concatenate([first.thetas, second.thetas], axis=1)
    np.testing.assert_array_equal(joined, full.thetas)
    # mismatched config must raise
    try:
        run_glmcmc_fused(prob, key, 513, jnp.zeros(2), checkpoint_path=bare,
                         resume=True, **{**kw, "steps_per_call": 64})
    except ValueError as e:
        assert "mismatch" in str(e)
    else:
        sys.exit("config mismatch did not raise")

print("DRIVE_OK resume bitwise-identical; mismatch raises")
