"""Device-mesh data parallelism.

The reference's only distributed feature is single-host nn.DataParallel
(reference scripts/04_train.py:75). The TPU-native equivalent is a 1-D
`data` mesh: parameters replicated, batch sharded over ICI, gradient
all-reduce inserted by XLA from the sharding annotations — no explicit
collectives needed at this model scale (~28M params).

The model is small enough that TP/PP are counterproductive; scaling is
purely along the batch axis, which rides ICI at line rate.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def get_mesh(n_devices: int = 0, devices=None) -> Mesh:
    """Build a 1-D data-parallel mesh.

    n_devices: 0 = all local devices; otherwise the first n.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded along axis 0.

    Batch size must be divisible by mesh size (the data loader's bucketed
    batching guarantees this).
    """
    sh = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sh)

    return jax.tree.map(put, batch, is_leaf=lambda x: x is None)
