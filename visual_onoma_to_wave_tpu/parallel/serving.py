"""Sharded batched inference: scale synthesis over a data mesh.

The reference serves single requests from a notebook on one device
(reference prediction.ipynb cell 5). For production serving, the whole
acoustic-model + vocoder forward is ONE jit (the same fused executable the
`Synthesizer`/HTTP serving stack uses, `synthesis.make_fused_infer`) whose
batch axis is sharded over the `data` mesh — XLA keeps every intermediate
(including the 256x-upsampled waveform) sharded, so per-chip memory and
compute stay constant as the mesh grows and no collectives are needed at
all (embarrassingly parallel over requests).

The production entry is `Synthesizer(..., mesh=...)` /
`Synthesizer.from_checkpoint(..., mesh="auto")`, which `cli serve` and
`cli demo` pick up automatically on multi-chip hosts. This module is the
thin library surface underneath for callers holding raw params.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from visual_onoma_to_wave_tpu.parallel.mesh import (
    batch_sharding,
    replicate_sharding,
    shard_batch,
)


def make_sharded_synth(model, gen, mesh, use_image: bool = True,
                       is_melgan: bool = False):
    """Build a mesh-sharded (acoustic -> vocoder) forward.

    Returns run(variables, gen_params, batch, e_control=1.0, d_control=1.0)
    -> (wavs (B, T*hop), mel_lens (B,)). `batch` is the Synthesizer-style
    dict (audiotypes, texts, src_lens, image_cells); batch size must divide
    the mesh size. e/d controls are per-item TRACED inputs (scalar or (B,)
    sequence): any mix of values shares one executable and one device batch
    (matching the fused serving path — static Python floats here would
    recompile per value). is_melgan routes the generator input through the
    log10 domain conversion MelGAN-family vocoders expect
    (reference utils/model.py:77).
    """
    from visual_onoma_to_wave_tpu.synthesis import make_fused_infer

    rep = replicate_sharding(mesh)
    shard = batch_sharding(mesh)
    fused = make_fused_infer(model, gen, use_image, is_melgan=is_melgan)

    def run(variables, gen_params, batch, e_control=1.0, d_control=1.0):
        B = batch["texts"].shape[0]
        if B % mesh.size != 0:
            raise ValueError(
                f"batch size {B} is not divisible by the {mesh.size}-device "
                f"mesh; pad the batch to a mesh multiple "
                f"(Synthesizer.batch_signature does this automatically)")

        def ctl(c):
            col = np.ones((B,), np.float32)
            col[:] = np.asarray(c, np.float32)    # scalar broadcasts
            return jax.device_put(jnp.asarray(col), shard)

        out = fused(
            jax.device_put(variables, rep),
            jax.device_put(gen_params, rep),
            shard_batch(batch, mesh),
            e_control=ctl(e_control), d_control=ctl(d_control))
        return out["wav"], out["mel_lens"]

    return run
