from visual_onoma_to_wave_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicate_sharding,
    shard_batch,
)

__all__ = ["batch_sharding", "get_mesh", "replicate_sharding", "shard_batch"]
