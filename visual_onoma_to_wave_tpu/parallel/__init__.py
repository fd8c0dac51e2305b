from visual_onoma_to_wave_tpu.parallel.distributed import (
    barrier,
    host_tree,
    init_distributed,
    is_multiprocess,
    is_primary,
    replicate,
    shard_batch_multiprocess,
)
from visual_onoma_to_wave_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicate_sharding,
    shard_batch,
)
from visual_onoma_to_wave_tpu.parallel.serving import make_sharded_synth

__all__ = [
    "barrier",
    "batch_sharding",
    "get_mesh",
    "host_tree",
    "init_distributed",
    "is_multiprocess",
    "is_primary",
    "make_sharded_synth",
    "replicate",
    "replicate_sharding",
    "shard_batch",
    "shard_batch_multiprocess",
]
