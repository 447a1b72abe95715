"""Weak-scaling benchmark: fixed chains-per-device, growing mesh.

The chain axis is embarrassingly parallel in the transition kernel (zero
collectives — see ``glabc_tpu/parallel``), so weak scaling should be near
100% up to the ICI/DCN limits; the only communication is in proposal
adaptation epochs.  On a real pod slice run this under
``jax.distributed.initialize``; without TPU hardware it runs on the virtual
CPU mesh (``--force-cpu``), which validates the partitioning rather than
absolute speed.

Usage:
    python benchmarks/scaling.py                 # real devices
    python benchmarks/scaling.py --force-cpu     # 8 virtual CPU devices
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--chains-per-device", type=int, default=1024)
    p.add_argument("--steps", type=int, default=512)
    p.add_argument("--force-cpu", action="store_true")
    p.add_argument("--fused", action="store_true",
                   help="scale the packed fused Pallas kernel under "
                        "shard_map instead of the scan path "
                        "(TPU-interpret mode on the CPU mesh)")
    args = p.parse_args()

    if args.force_cpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax
    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from glabc_tpu import DiagGaussian, MixtureProblem
    from glabc_tpu.parallel import make_mesh, shard_chains
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

    n_avail = len(jax.devices())
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    base_rate = None
    path = "packed fused kernel (shard_map)" if args.fused else "scan path"
    print(f"devices available: {n_avail}; {path}; "
          f"{args.chains_per_device} chains/device x {args.steps} steps")
    for n in sizes:
        mesh = make_mesh(n)
        C = args.chains_per_device * n
        if args.fused:
            import numpy as np
            from jax.sharding import NamedSharding, PartitionSpec as P
            from glabc_tpu.ops.pallas.packed_kernel import (
                PackedMixtureGLMCMC,
                packed_state_init,
            )

            on_tpu = jax.devices()[0].platform == "tpu"
            blk = min(512, max(128, args.chains_per_device // 4))
            kern = PackedMixtureGLMCMC(
                2, problem.y_obs, epsilon=0.05,
                sigma=float(jnp.sqrt(0.05)), steps_per_call=args.steps,
                block_chains=blk, collect_history=False,
                interpret=not on_tpu,
            )
            cols = C // 4  # pack = 8 // d = 4 chains per sublane group
            assert cols % (blk * n) == 0, (
                "chains-per-device must give columns divisible by "
                "block_chains * devices")
            th, y, lk = packed_state_init(problem, jax.random.PRNGKey(0),
                                          jnp.zeros(2), cols, 4)
            sh = NamedSharding(mesh, P(None, "chains"))
            th, y, lk = (jax.device_put(x, sh) for x in (th, y, lk))
            run = kern.make_sharded_run(mesh)

            def seg_fused(state, i):
                return run(np.int32(i), *state)[:3]

            state = seg_fused((th, y, lk), 1)
            jax.block_until_ready(state[0])
            best = float("inf")
            for i in range(3):
                t0 = time.perf_counter()
                state = seg_fused(state, 2 + i)
                jax.block_until_ready(state[0])
                best = min(best, time.perf_counter() - t0)
        else:
            carry = init_chain_carry(
                problem, jax.random.PRNGKey(0), jnp.zeros(2), num_chains=C
            )
            carry = shard_chains(carry, mesh)

            @jax.jit
            def seg(c):
                def body(cc, _):
                    return batched(cc, None)[0], None
                return jax.lax.scan(body, c, None, length=args.steps)[0]

            carry = seg(carry)
            jax.block_until_ready(carry.theta)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                carry = seg(carry)
                jax.block_until_ready(carry.theta)
                best = min(best, time.perf_counter() - t0)
        rate = C * args.steps / best
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(f"  {n:2d} devices: {rate:14,.0f} trans/s   "
              f"weak-scaling efficiency {eff:6.1%}")


if __name__ == "__main__":
    main()
