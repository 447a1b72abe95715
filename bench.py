"""Benchmark: vectorized ABC-MCMC transitions/s/chip on the 2-D Mixture.

Canonical GLMCMC config (gf=0.9, batch_size=5 — reference
``examples/Mixture.py:73``) vmapped over chains, as one jitted ``lax.scan``.
Baseline = the driver north-star target of 1e6 transitions/s/chip
(BASELINE.md; the reference itself publishes no numbers — its Python loop
measures ~1-3e3 it/s single-chain on CPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
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

    C = 16384   # chains per chip
    T = 1024    # transitions per timed segment

    carry = init_chain_carry(
        problem, jax.random.PRNGKey(0), jnp.zeros(2), num_chains=C
    )

    @jax.jit
    def segment(c):
        def body(cc, _):
            new_cc, _out = batched(cc, None)
            return new_cc, None
        c, _ = jax.lax.scan(body, c, None, length=T)
        return c

    # warmup / compile
    carry = segment(carry)
    jax.block_until_ready(carry.theta)

    best = float("inf")
    reps = 3
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = segment(carry)
        jax.block_until_ready(carry.theta)
        best = min(best, time.perf_counter() - t0)

    value = C * T / best
    print(json.dumps({
        "metric": "glmcmc_mixture_transitions_per_s_per_chip",
        "value": round(value, 1),
        "unit": "transitions/s",
        "vs_baseline": round(value / 1.0e6, 3),
    }))


if __name__ == "__main__":
    main()
