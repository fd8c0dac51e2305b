from visual_onoma_to_wave_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicate_sharding,
    shard_batch,
)
from visual_onoma_to_wave_tpu.parallel.serving import make_sharded_synth

__all__ = [
    "batch_sharding",
    "get_mesh",
    "make_sharded_synth",
    "replicate_sharding",
    "shard_batch",
]
