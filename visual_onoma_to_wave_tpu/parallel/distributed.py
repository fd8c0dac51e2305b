"""Multi-process (multi-host) data parallelism.

The reference's distribution ceiling is single-process ``nn.DataParallel``
(reference scripts/04_train.py:75). The TPU-native scale-out goes one level
further: on a multi-host pod slice each host process owns its local chips,
``jax.distributed.initialize`` federates them into one global device set,
and the SAME 1-D ``data`` mesh (parallel/mesh.py) then spans every host —
XLA inserts the gradient all-reduce over ICI within a slice and DCN across
slices. Nothing about the train step changes: it is the same jit program,
now laid out over more devices.

Host data plane: every process plans the identically-seeded epoch from
metadata (so all hosts agree on batch composition and padded shapes) and
contributes only its own row slice of each global batch through
``jax.make_array_from_process_local_data`` — device batches never cross
hosts on the host network.

Testing: CPU processes federate the same way (gloo collectives), so the
multi-host path is exercised hermetically by
tests/test_distributed_training.py with 2 processes x 4 virtual devices.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np

from visual_onoma_to_wave_tpu.parallel.mesh import (
    batch_sharding,
    replicate_sharding,
)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     cpu_devices_per_process: int | None = None) -> None:
    """Join (or start) the multi-process runtime. Call before any other JAX
    API touches a device backend.

    On TPU pods all arguments may be None — ``jax.distributed.initialize``
    auto-detects the coordinator and process topology from the TPU
    metadata. ``cpu_devices_per_process`` forces the CPU backend with N
    virtual devices and gloo cross-process collectives (hermetic tests /
    dry runs of the multi-host layout on CPU hosts).
    """
    if cpu_devices_per_process:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.config.update("jax_num_cpu_devices", int(cpu_devices_per_process))
    kwargs: dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    if jax.process_count() > 1:
        # Form the cross-process communicator NOW, while every process sits
        # at the same point: the backend's context init exchanges keys with
        # a hard ~30 s deadline measured from the FIRST collective, and the
        # first collective otherwise happens only after each process builds
        # its (possibly multi-minute, load-skewed) model/trainer stack —
        # a loaded host then times out the slowest process's handshake.
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("init_distributed_warmup")


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should own host-side side effects
    (checkpoint writes, metric logs, sample wavs)."""
    return jax.process_index() == 0


def shard_batch_multiprocess(batch: dict, mesh,
                             already_local: bool = False) -> dict:
    """Build the global sharded device batch from host data.

    already_local=False: every process holds the SAME full host batch
    (identical seeds make the loaders agree); each contributes only its
    contiguous row slice [p*B/P, (p+1)*B/P) to the devices.

    already_local=True: the batch holds ONLY this process's rows (the
    partitioned loader path, data/loader.py local_slice — every host then
    loads 1/P of the data instead of all of it); the global batch is
    P x local rows. Padded shapes must already agree across hosts
    (`OnomaDataset.plan_pad_shapes`).

    Either way per-host H2D traffic is B/P rows, and the global batch size
    must divide by mesh.size.
    """
    sh = batch_sharding(mesh)
    p, n = jax.process_index(), jax.process_count()

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        if already_local:
            local = np.ascontiguousarray(x)
            global_shape = (x.shape[0] * n,) + x.shape[1:]
        else:
            b = x.shape[0]
            if b % n:
                raise ValueError(
                    f"batch size {b} not divisible by {n} processes")
            rows = b // n
            local = np.ascontiguousarray(x[p * rows:(p + 1) * rows])
            global_shape = x.shape
        return jax.make_array_from_process_local_data(sh, local,
                                                      global_shape)

    return jax.tree.map(put, batch, is_leaf=lambda x: x is None)


def replicate(tree, mesh):
    """Place a host pytree fully replicated over the (multi-process) mesh.

    Used for the train state (params/opt state identical on every host)
    and for small batches that are cheaper to compute redundantly than to
    shard (e.g. ragged validation tails, single-sample synthesis)."""
    rep = replicate_sharding(mesh)
    return jax.tree.map(
        lambda x: None if x is None else jax.device_put(np.asarray(x), rep),
        tree, is_leaf=lambda x: x is None)


def host_tree(tree):
    """Fetch a pytree of (possibly batch-sharded, hence not fully
    addressable) global arrays to host memory on EVERY process.

    Single-process: plain device_get. Multi-process: an all-gather over
    the process set — every process must call this (it is a collective)."""
    if jax.process_count() == 1:
        return jax.device_get(tree)
    from jax.experimental import multihost_utils
    return jax.device_get(multihost_utils.process_allgather(tree, tiled=True))


def barrier(name: str) -> None:
    """Block until every process reaches this point (no-op single-process).
    Used to keep fast processes from exiting while the primary is still
    writing the final checkpoint."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
