from ssme_tpu.parallel.distributed import (
    fetch_across_hosts,
    initialize_distributed,
    make_global_mesh,
)
from ssme_tpu.parallel.kernel_sharded import (
    shard_batched_log_like,
    sharded_megakernel_log_like,
)
from ssme_tpu.parallel.mesh import (
    make_mesh,
    chain_sharding,
    particle_sharding,
    shard_chain_state,
    jit_sharded_pmmh,
    shard_swarm_state,
    jit_sharded_swarm,
)
from ssme_tpu.parallel.sharded_lw import (
    ShardedLiuWest,
    make_sharded_lw_runner,
)

__all__ = [
    "make_mesh", "chain_sharding", "particle_sharding",
    "shard_chain_state", "jit_sharded_pmmh",
    "shard_batched_log_like", "sharded_megakernel_log_like",
    "initialize_distributed", "make_global_mesh", "fetch_across_hosts",
    "ShardedLiuWest", "make_sharded_lw_runner",
    "shard_swarm_state", "jit_sharded_swarm",
]
