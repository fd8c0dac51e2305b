"""HiFi-GAN GAN-training step throughput on TPU (full V1 config).

One donated jit step = G forward, D update (MPD+MSD), G update
(adv + feature-matching + 45x mel L1). Prints JSON: step ms, audio-seconds
trained per second, and an estimate vs the official single-GPU recipe
scale (batch 16 x 8192 samples).

Usage: python benchmarks/bench_vocoder_train.py [--batch N] [--steps N]
           [--family hifigan|istftnet|istftnet-mel|vocos|bigvgan]
           [--disc msd|mrd] [--bf16]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    batch = 16
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    iters = 10
    if "--steps" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--steps") + 1])

    family = "hifigan"
    if "--family" in sys.argv:
        family = sys.argv[sys.argv.index("--family") + 1]
    dtype = "bfloat16" if "--bf16" in sys.argv else "float32"
    gen = None
    if family != "hifigan":
        from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
        gen = get_vocoder(family, dtype=jnp.dtype(dtype))
    msd = None
    disc = "msd"
    if "--disc" in sys.argv:
        disc = sys.argv[sys.argv.index("--disc") + 1]
    if disc == "mrd":  # UnivNet/BigVGAN MPD+MRD recipe
        from visual_onoma_to_wave_tpu.models.hifigan_disc import (
            MultiResolutionDiscriminator)
        msd = MultiResolutionDiscriminator(dtype=jnp.dtype(dtype))

    cfg = VocoderTrainConfig(batch_size=batch, compute_dtype=dtype)
    rng = np.random.default_rng(0)
    clips = [rng.uniform(-0.5, 0.5, 30000).astype(np.float32)
             for _ in range(8)]
    t0 = time.perf_counter()
    trainer = VocoderTrainer(clips, cfg, gen=gen, msd=msd, use_mesh=False)
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    # 2 synced warmups (block_until_ready is a no-op on the tunnel: sync by
    # fetching a scalar metric)
    for _ in range(2):
        audio = jnp.asarray(trainer.sampler.next_batch())
        trainer.state, m = trainer.train_step(trainer.state, audio)
        float(jax.device_get(m["g_total"]))
    print(f"warm at {time.perf_counter() - t0:.1f}s", flush=True)

    batches = [jnp.asarray(trainer.sampler.next_batch()) for _ in range(iters)]
    t1 = time.perf_counter()
    m = None
    for a in batches:
        trainer.state, m = trainer.train_step(trainer.state, a)
    float(jax.device_get(m["g_total"]))
    dt = (time.perf_counter() - t1) / iters

    audio_sec = batch * cfg.segment_size / cfg.sampling_rate
    print(json.dumps({
        "metric": "vocoder_gan_train_step",
        "family": family, "disc": f"mpd+{disc}", "dtype": dtype,
        "batch": batch, "segment": cfg.segment_size,
        "step_ms": round(dt * 1e3, 2),
        "audio_sec_per_sec": round(audio_sec / dt, 1),
        "steps_per_sec": round(1.0 / dt, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
