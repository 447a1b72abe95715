"""Benchmark: vectorized ABC-MCMC transitions/s/chip on the 2-D Mixture.

Canonical GLMCMC config (gf=0.9, batch_size=5 — reference
``examples/Mixture.py:73``) on the fused Pallas transition kernel
(propose -> simulate -> discrepancy -> epsilon-kernel -> iSIR/MH select in
one VMEM-resident loop with on-chip PRNG, chain history collected).  Falls
back to the XLA-fused ``lax.scan`` path if the Pallas kernel is unavailable
on the current backend.

Baseline = the driver north-star target of 1e6 transitions/s/chip
(BASELINE.md; the reference publishes no numbers — its Python loop runs
~1-9e3 it/s single-chain on CPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench_fused():
    """Packed fused kernel (8/d chains per sublane group), history collected."""
    from glabc_tpu import MixtureProblem
    from glabc_tpu.ops.pallas.packed_kernel import (
        PackedMixtureGLMCMC,
        packed_state_init,
    )

    problem = MixtureProblem(0.05)
    # Chain count saturates per-call dispatch overhead around ~5e5 chains
    # (sweep: 16k -> 518M, 64k -> 1.08B, 512k -> 1.93B, 2M -> 2.03B trans/s);
    # run at the 2M-chain saturation point — history stays on device
    # (~4.3 GiB HBM per call at this config).
    cols = 524288
    kern = PackedMixtureGLMCMC(
        2, problem.y_obs, epsilon=0.05, sigma=float(np.sqrt(0.05)),
        global_frequency=0.9, batch_size=5, ip_scale=1.0, lp_scale=0.35,
        steps_per_call=256, block_chains=512, collect_history=True,
    )
    C = kern.pack * cols  # 524288 chains
    theta, y, logk = packed_state_init(
        problem, jax.random.PRNGKey(0), jnp.zeros(2), cols, kern.pack
    )
    # warmup / compile
    theta, y, logk, hist, st = kern.run(1, theta, y, logk)
    jax.block_until_ready(theta)

    best = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(4):
            theta, y, logk, hist, st = kern.run(10 + rep * 4 + i, theta, y,
                                                logk)
        jax.block_until_ready(hist)
        best = min(best, (time.perf_counter() - t0) / 4)

    # Posterior self-check on the final call's 134M recorded samples (the
    # chains have 3328 steps of burn-in by now).  Packed layout: sublane row
    # r of the (T, 8, C) history is dim r % d of chain group r // d; per-dim
    # E|theta| of the Mixture posterior is 1.4247 (PARITY_RESULTS.md, vs
    # reference 1.4255/1.4299).  Per-step f32 means are averaged in f64 on
    # the host (f32 accumulation drifts beyond ~1e7 samples).
    absmean = _packed_absmean(hist, d=2)
    return C * kern.T / best, absmean


@jax.jit
def _per_step_absmean(hist):
    return jnp.mean(jnp.abs(hist), axis=(1, 2))


def _packed_absmean(hist, d: int):
    out = []
    for dim in range(d):
        rows = _per_step_absmean(hist[:, dim::d, :])
        out.append(float(np.mean(np.asarray(rows, np.float64))))
    return out


def bench_scan():
    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.samplers import (
        GLMCMCConfig,
        build_glmcmc_step,
        init_chain_carry,
    )

    problem = MixtureProblem(0.05)
    ip = DiagGaussian.create(2, 0.0, 0.0)
    lp = DiagGaussian.create(2, 0.0, float(jnp.log(0.35)))
    step = build_glmcmc_step(problem, ip, lp, GLMCMCConfig(0.9, 5))
    batched = jax.vmap(step, in_axes=(0, None))
    C, T = 8192, 512
    carry = init_chain_carry(
        problem, jax.random.PRNGKey(0), jnp.zeros(2), num_chains=C
    )

    @jax.jit
    def segment(c):
        def body(cc, _):
            return batched(cc, None)[0], None
        return jax.lax.scan(body, c, None, length=T)[0]

    carry = segment(carry)
    jax.block_until_ready(carry.theta)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        carry = segment(carry)
        jax.block_until_ready(carry.theta)
        best = min(best, time.perf_counter() - t0)
    return C * T / best


def main():
    # Explicit routing: the Pallas kernel is the benchmark on TPU; the scan
    # path is only for CPU-only environments.  A fused-kernel failure on TPU
    # raises (no silent fallback masking a regression), and the posterior
    # absmean assertion certifies the measured run is statistically correct.
    print(f"device claimed: {jax.devices()}", file=sys.stderr, flush=True)
    if jax.devices()[0].platform == "cpu":
        value = bench_scan()
        metric = "glmcmc_mixture_transitions_per_s_per_chip_scan_fallback"
        extra = {}
    else:
        value, absmean = bench_fused()
        metric = "glmcmc_mixture_transitions_per_s_per_chip"
        for m in absmean:
            assert 1.40 <= m <= 1.45, (
                f"posterior self-check failed: per-dim E|theta| = {absmean} "
                f"(expected ~1.4247 +- 0.025, reference 1.4255/1.4299)")
        extra = {"posterior_absmean": [round(m, 4) for m in absmean]}
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "transitions/s",
        "vs_baseline": round(value / 1.0e6, 3),
        **extra,
    }))


if __name__ == "__main__":
    main()
