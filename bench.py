"""Benchmark harness: batched waveform synthesis real-time factor per chip.

Headline metric (BASELINE.md): acoustic model (predicted durations) +
HiFi-GAN V1 vocoder, batched, on one TPU chip. RTF = generated audio seconds
per wall-clock second. Baseline target: >= 50x real time.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.config import Config
    from visual_onoma_to_wave_tpu.models import VTTS
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator

    B, C, MAX_MEL = 16, 8, 512
    HOP, SR = 256, 22050

    cfg = Config()
    model = VTTS.from_config(cfg, n_vocab=64, max_mel_len=MAX_MEL)
    rng = np.random.default_rng(0)
    batch = {
        "audiotypes": jnp.asarray((np.arange(B) % 10).astype(np.int32)),
        "texts": jnp.asarray(rng.integers(1, 64, (B, C)).astype(np.int32)),
        "src_lens": jnp.asarray(np.full((B,), C, np.int32)),
        "image_cells": jnp.asarray(
            rng.uniform(0, 1, (B, C, 24, 102)).astype(np.float32)),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, use_image=True, deterministic=True)

    gen = HiFiGANGenerator()
    # bias durations so clips fill most of the mel buffer (realistic load)
    dur_bias = float(np.log(MAX_MEL / C))

    @jax.jit
    def synth(params, batch_stats, gen_params, batch, salt):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            audiotypes=batch["audiotypes"], texts=batch["texts"],
            src_lens=batch["src_lens"], image_cells=batch["image_cells"] + salt,
            use_image=True, deterministic=True)
        # shift predicted log-durations to a realistic operating point
        d = jnp.maximum(jnp.round(
            jnp.exp(out["log_duration_pred"] + dur_bias) - 1.0), 1.0)
        mel_len = jnp.minimum(jnp.sum(d.astype(jnp.int32), axis=-1), MAX_MEL)
        wav = gen.apply(gen_params, out["postnet_mel"])
        # tiny checksum: forces full execution but only a scalar crosses the
        # host link.  block_until_ready() is a no-op on the tunneled platform,
        # so all timing syncs MUST go through device_get of this value.
        return jnp.sum(wav[:, ::4097]) + jnp.sum(mel_len), mel_len

    gen_params = gen.init(jax.random.PRNGKey(2),
                          jnp.zeros((1, 16, 80), jnp.float32))

    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    # warmup / compile (device_get = real sync)
    for i in range(2):
        chk, _ = synth(params, batch_stats, gen_params, batch,
                       jnp.float32(0.01 * i))
        float(jax.device_get(chk))

    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        # vary an input each iteration so no caching layer can elide work
        chk, mel_len = synth(params, batch_stats, gen_params, batch,
                             jnp.float32(0.001 * (i + 1)))
    float(jax.device_get(chk))
    dt = time.perf_counter() - t0

    # every iteration vocodes the full padded mel buffer: B * MAX_MEL frames
    audio_sec = iters * B * MAX_MEL * HOP / SR
    rtf = audio_sec / dt
    print(json.dumps({
        "metric": "batched_synthesis_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 50.0, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
