from .mesh import (
    CHAIN_AXIS,
    chain_sharding,
    initialize_distributed,
    make_mesh,
    replicated_sharding,
    shard_chains,
)
from .sharded import (
    distributed_systematic_resample,
    distributed_quantile,
    make_sharded_chain_state_trainer,
    make_sharded_flow_trainer,
    make_sharded_shared_epoch,
    sharded_hat_eps_update,
    sharded_sample,
)

__all__ = [
    "CHAIN_AXIS",
    "chain_sharding",
    "initialize_distributed",
    "make_mesh",
    "replicated_sharding",
    "shard_chains",
    "distributed_quantile",
    "distributed_systematic_resample",
    "make_sharded_chain_state_trainer",
    "make_sharded_flow_trainer",
    "make_sharded_shared_epoch",
    "sharded_hat_eps_update",
    "sharded_sample",
]
