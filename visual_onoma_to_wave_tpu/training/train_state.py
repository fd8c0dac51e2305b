"""Train state + jitted train/eval steps for the VTTS acoustic model.

TPU-native replacement for the reference training loop internals
(reference scripts/04_train.py:115-175): one jit-compiled step containing
forward, loss, backward, global-norm clip and Adam/Noam update. Data
parallelism comes from input shardings over a 1-D `data` mesh; XLA inserts
the gradient all-reduce.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from visual_onoma_to_wave_tpu.training.loss import fastspeech2_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(model, tx: optax.GradientTransformation, rng: jax.Array,
                       sample_batch: dict, use_image: bool = True) -> TrainState:
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng},
        audiotypes=sample_batch["audiotypes"],
        texts=sample_batch["texts"],
        src_lens=sample_batch["src_lens"],
        image_cells=sample_batch.get("image_cells"),
        energy_targets=sample_batch.get("energies"),
        kurtosis_targets=sample_batch.get("kurtoses"),
        duration_targets=sample_batch.get("durations"),
        use_image=use_image,
        deterministic=True,
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )


def make_train_step(model, tx: optax.GradientTransformation,
                    use_image: bool = True) -> Callable:
    """Build the jitted training step.

    batch dict keys: audiotypes, texts, src_lens, image_cells (opt), mels,
    energies (opt), kurtoses (opt), durations.
    """

    def loss_fn(params, batch_stats, batch, dropout_rng):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            audiotypes=batch["audiotypes"],
            texts=batch["texts"],
            src_lens=batch["src_lens"],
            image_cells=batch.get("image_cells"),
            energy_targets=batch.get("energies"),
            kurtosis_targets=batch.get("kurtoses"),
            duration_targets=batch["durations"],
            use_image=use_image,
            deterministic=False,
            max_mel_len=batch["mels"].shape[1],
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        losses = fastspeech2_loss(outputs, batch)
        return losses["total_loss"], (losses, mutated["batch_stats"])

    # Donate the incoming state: params/opt_state buffers (~3x params HBM
    # for Adam) are reused for the updated state instead of living alongside
    # it. Callers must treat the passed-in state as consumed (the trainer
    # reassigns self.state every step). Eval/synth steps do NOT donate —
    # their state is reused across the whole val split.
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        dropout_rng = jax.random.fold_in(rng, state.step)
        # Dropout touches ~190M elements/step (0.5 on the 512-ch PostNet +
        # 0.2 across 10 FFT blocks); threefry bit generation alone costs
        # ~5 ms of a 62 ms B=64 step (docs/PERF.md). The rbg PRNG lowers to
        # the TPU's hardware RngBitGenerator: same key -> same masks within
        # a backend, ~4 ms faster. Derived deterministically from the
        # caller's threefry key.
        if jnp.issubdtype(dropout_rng.dtype, jax.dtypes.prng_key):
            kd = jax.random.key_data(dropout_rng)
        else:  # raw (2,) uint32 key array
            kd = dropout_rng
        dropout_rng = jax.random.wrap_key_data(
            jnp.concatenate([kd, kd]), impl="rbg")
        grads, (losses, new_bs) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, dropout_rng)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt_state,
        )
        losses = dict(losses, grad_norm=optax.global_norm(grads))
        return new_state, losses

    return train_step


def make_eval_step(model, use_image: bool = True) -> Callable:
    @jax.jit
    def eval_step(state: TrainState, batch: dict):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            audiotypes=batch["audiotypes"],
            texts=batch["texts"],
            src_lens=batch["src_lens"],
            image_cells=batch.get("image_cells"),
            energy_targets=batch.get("energies"),
            kurtosis_targets=batch.get("kurtoses"),
            duration_targets=batch["durations"],
            use_image=use_image,
            deterministic=True,
            max_mel_len=batch["mels"].shape[1],
        )
        losses = fastspeech2_loss(outputs, batch)
        return losses, outputs

    return eval_step


def make_synth_step(model, use_image: bool = True) -> Callable:
    """Inference forward (no targets): predicted durations drive the LR."""

    # e/d controls are TRACED args (pure multiplications in the variance
    # adaptor) — new control values reuse the compiled executable instead of
    # triggering a recompile + one-time upload per value
    @jax.jit
    def synth_step(state: TrainState, batch: dict,
                   e_control=1.0, d_control=1.0):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            audiotypes=batch["audiotypes"],
            texts=batch["texts"],
            src_lens=batch["src_lens"],
            image_cells=batch.get("image_cells"),
            use_image=use_image,
            e_control=e_control,
            d_control=d_control,
            deterministic=True,
        )

    return synth_step
