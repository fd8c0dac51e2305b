"""Sharded batched inference: scale synthesis over a data mesh.

The reference serves single requests from a notebook on one device
(prediction.ipynb cell 5). For production serving, the whole
acoustic-model + vocoder forward is one jit whose batch axis is sharded
over the `data` mesh — XLA keeps every intermediate (including the
256x-upsampled waveform) sharded, so per-chip memory and compute stay
constant as the mesh grows and no collectives are needed at all
(embarrassingly parallel over requests; ICI is only used if a reshard is
forced by the caller).
"""
from __future__ import annotations

import functools

import jax

from visual_onoma_to_wave_tpu.parallel.mesh import (
    batch_sharding,
    replicate_sharding,
    shard_batch,
)


def make_sharded_synth(model, gen, mesh, use_image: bool = True,
                       e_control: float = 1.0, d_control: float = 1.0):
    """Build a jitted batch-sharded (acoustic -> vocoder) forward.

    Returns fn(state_params_tuple, batch) -> (wavs (B, T*hop), mel_lens (B,)).
    `batch` is the Synthesizer-style dict (audiotypes, texts, src_lens,
    image_cells); batch size must divide the mesh size.
    """
    rep = replicate_sharding(mesh)
    shard = batch_sharding(mesh)

    @functools.partial(
        jax.jit,
        in_shardings=(rep, rep, None),
        out_shardings=(shard, shard),
    )
    def fn(variables, gen_params, batch):
        out = model.apply(
            variables,
            audiotypes=batch["audiotypes"],
            texts=batch["texts"],
            src_lens=batch["src_lens"],
            image_cells=batch.get("image_cells"),
            use_image=use_image,
            e_control=e_control,
            d_control=d_control,
            deterministic=True,
        )
        wav = gen.apply(gen_params, out["postnet_mel"])
        return wav, out["mel_lens"]

    def run(variables, gen_params, batch):
        return fn(variables, gen_params, shard_batch(batch, mesh))

    return run
