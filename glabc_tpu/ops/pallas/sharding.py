"""Multi-chip execution of the fused kernels: one shard_map wrapper.

Every fused kernel (packed GLMCMC, packed GLMALA, generic TileProgram) is
chain-elementwise, so its multi-chip form is identical: shard the chain
(lane) axis of the state tiles over a 1-D mesh, run the per-device
``pallas_call`` inside ``shard_map`` (zero collectives), and offset each
device's PRNG seed by ``device_index * local_blocks`` grid slots so the
device streams tile the exact seed->stream pattern of one big
single-device grid (the in-kernel stream is
``seed + program_id * golden_ratio_hash``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["SEED_STRIDE", "make_sharded_kernel_run"]

# golden-ratio hash multiplier used by every kernel's per-program seeding
SEED_STRIDE = -1640531527


def make_sharded_kernel_run(run_fn, block_chains: int, num_state: int,
                            num_replicated: int, stats_cls,
                            collect_history: bool, mesh):
    """Wrap a fused kernel's ``run(seed, *replicated, *state)`` for a
    chain-sharded mesh.

    ``num_state`` state tiles are ``(rows, C)`` sharded on the lane axis;
    ``num_replicated`` leading extras (e.g. GLMALA's per-step coins) are
    replicated.  ``run_fn`` must return ``(*state, history|None, stats)``
    with ``stats`` a ``stats_cls`` of per-chain ``(rows, C)`` counters.
    """
    from jax.sharding import PartitionSpec as P
    from ...parallel.mesh import CHAIN_AXIS

    def worker(seed, *args):
        repl = args[:num_replicated]
        state = args[num_replicated:]
        my = jax.lax.axis_index(CHAIN_AXIS)
        n_blk_local = state[0].shape[-1] // block_chains
        seed_dev = seed + (my.astype(jnp.int32)
                           * jnp.int32(n_blk_local)
                           * jnp.int32(SEED_STRIDE))
        return run_fn(seed_dev, *repl, *state)

    state_p = P(None, CHAIN_AXIS)
    hist_p = P(None, None, CHAIN_AXIS)
    stats_p = stats_cls(*(state_p for _ in stats_cls._fields))
    sharded = jax.shard_map(
        worker, mesh=mesh,
        in_specs=(P(),) + (P(),) * num_replicated + (state_p,) * num_state,
        out_specs=((state_p,) * num_state
                   + ((hist_p if collect_history else None), stats_p)),
        check_vma=False,
    )
    return jax.jit(sharded)
