"""Orbax checkpointing of {params, batch_stats, opt_state, step}.

TPU-native replacement for the reference torch.save/load checkpoints
(reference scripts/04_train.py:160-168, utils/model.py:14-29): saving every
save_step steps, restoring both model and optimizer state along with the LR
schedule position (the schedule reads the optax step counter, so resume
continues the Noam curve exactly like the reference's `current_step`).
"""
from __future__ import annotations

import pathlib
from typing import Any

import jax
import orbax.checkpoint as ocp

from visual_onoma_to_wave_tpu.training.train_state import TrainState


class CheckpointManager:
    def __init__(self, ckpt_dir: str | pathlib.Path, max_to_keep: int = 20):
        self.dir = pathlib.Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            str(self.dir),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, state: TrainState, step: int | None = None) -> None:
        step = int(state.step) if step is None else step
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore(self, template: TrainState, step: int | None = None) -> TrainState:
        if step is None:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_raw(self, step: int | None = None) -> dict:
        """Restore a checkpoint WITHOUT a template TrainState: returns the
        raw pytree (dict with params / batch_stats / opt_state / step).
        Serving uses this to avoid building a model + optimizer just to get
        a restore target (reference get_model builds the full training stack,
        utils/model.py:10-33).

        Restores onto the CURRENT device topology (fully local/replicated):
        a checkpoint written by an N-device training mesh loads fine on a
        single serving chip."""
        if step is None or step == -1:
            step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.dir}")
        path = self.dir / str(step) / "default"
        ckptr = ocp.StandardCheckpointer()
        meta = ckptr.metadata(path).item_metadata.tree
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding), meta)
        return ckptr.restore(path, target=abstract)

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def all_steps(self) -> list[int]:
        return sorted(self._mgr.all_steps())

    def close(self):
        self._mgr.close()


def save_params(path: str | pathlib.Path, params: Any) -> None:
    """One-shot pytree save (e.g. converted vocoder weights).

    Arrays are pulled to host first so the checkpoint carries no device /
    sharding metadata — a params dir written on a TPU host must load on a
    CPU-only host (the committed demo checkpoints depend on this)."""
    p = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(p, jax.device_get(params), force=True)
    ckptr.wait_until_finished()


def load_params(path: str | pathlib.Path, template: Any = None) -> Any:
    """Restore a one-shot params dir onto the CURRENT platform: the saved
    sharding metadata is ignored (checkpoints written on another device
    topology — e.g. the TPU that trained the committed demo artifacts —
    load fine on this host's default device)."""
    p = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(p, target=template)
    meta = ckptr.metadata(p).item_metadata.tree
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    abstract = jax.tree.map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=sharding),
        meta)
    return ckptr.restore(p, target=abstract)
