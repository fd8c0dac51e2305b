"""Long-budget vocoder training arms (round-3 VERDICT #4): ground the
200k-regime claims that were extrapolated from 2000-step runs.

Trains each family FROM SCRATCH to --steps (default 20 000) GAN steps with
generator EMA running at --ema (default 0.9999, the published 200k-recipe
decay), and scores copy-synthesis on the held-out clips every --every
steps — BOTH the raw iterate and the EMA iterate, in mel (mel L1, MCD) and
waveform (multi-resolution STFT) domains. One JSON line per
(family, step, iterate).

This answers two round-3 hedges with data (BASELINE.md):
  * does the 2000-step family ranking (Vocos/iSTFTNet-mel ahead of
    HiFi-GAN V1) hold at 10x budget, or was it a fast-start artifact?
  * is "EMA-0.9999's regime is the long run" true — i.e. does the EMA
    iterate overtake the raw one once past the convergence transient?

Corpus/scoring identical to benchmarks/bench_vocoder_quality.py (imported
from it): 24 structured bell/drum clips, 4 held out.

Usage:
    python benchmarks/bench_vocoder_longrun.py \
        [--families vocos,hifigan] [--steps 20000] [--every 2000] \
        [--ema 0.9999] [--batch 16]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from bench_vocoder_quality import _clip  # noqa: E402  (shared corpus)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.metrics import (
        mcd_frames, mel_l1, mrstft_distance)
    from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
    from visual_onoma_to_wave_tpu.ops.stft import (
        hann_window, logmel_and_energy, melscale_fbanks)
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    steps = 20_000
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    every = 2_000
    if "--every" in sys.argv:
        every = int(sys.argv[sys.argv.index("--every") + 1])
    batch = 16
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    families = ["vocos", "hifigan"]
    if "--families" in sys.argv:
        families = sys.argv[sys.argv.index("--families") + 1].split(",")
    ema_decay = 0.9999
    if "--ema" in sys.argv:
        ema_decay = float(sys.argv[sys.argv.index("--ema") + 1])

    rng = np.random.default_rng(0)
    clips = [_clip(rng) for _ in range(24)]
    train_clips, held_out = clips[:20], clips[20:]

    cfg = VocoderTrainConfig(total_steps=steps, batch_size=batch,
                             save_every=10 ** 9,
                             log_every=max(every // 2, 1),
                             ema_decay=ema_decay)
    window = jnp.asarray(hann_window(cfg.win_length))
    fb = jnp.asarray(melscale_fbanks(cfg.n_fft // 2 + 1, cfg.f_min,
                                     cfg.f_max, cfg.n_mels,
                                     cfg.sampling_rate))

    @jax.jit
    def logmel(audio):
        m, _ = logmel_and_energy(audio, window, fb, cfg.n_fft,
                                 cfg.hop_length, cfg.win_length)
        return m

    gt = []
    for c in held_out:
        t = len(c) // cfg.hop_length
        audio = c[: t * cfg.hop_length]
        mel = np.asarray(jax.device_get(logmel(jnp.asarray(audio)[None])))[0]
        gt.append((audio, mel))

    for family in families:
        gen = (get_vocoder(family) if family != "hifigan" else None)
        vt = VocoderTrainer(train_clips, cfg, gen=gen, use_mesh=False)

        @jax.jit
        def vocode(params, mel_bt, gen=vt.gen):
            return gen.apply(params, mel_bt)

        def score(params):
            l1s, mcds, scs, mags = [], [], [], []
            for audio, mel in gt:
                wav = np.asarray(jax.device_get(
                    vocode(params, jnp.asarray(mel.T)[None])))[0][: len(audio)]
                wav = np.clip(wav, -1.0, 1.0)
                mel2 = np.asarray(jax.device_get(
                    logmel(jnp.asarray(wav)[None])))[0]
                t = min(mel.shape[1], mel2.shape[1])
                l1s.append(mel_l1(mel2[:, :t].T, mel[:, :t].T))
                mcds.append(mcd_frames(mel2[:, :t].T, mel[:, :t].T))
                d = mrstft_distance(wav, audio)
                scs.append(d["sc"])
                mags.append(d["mag"])
            return {"mel_l1": round(float(np.mean(l1s)), 4),
                    "mcd_db": round(float(np.mean(mcds)), 2),
                    "mrstft_sc": round(float(np.mean(scs)), 4),
                    "mrstft_mag": round(float(np.mean(mags)), 4),
                    "mrstft": round(float(np.mean(scs) + np.mean(mags)), 4)}

        t0 = time.perf_counter()
        for target in range(every, steps + 1, every):
            vt.train(steps=target)
            wall = time.perf_counter() - t0
            variants = [("raw", vt.state.gen_params)]
            if vt.state.gen_ema is not None:
                variants.append(("ema", vt.state.gen_ema))
            for tag, params in variants:
                print(json.dumps({
                    "metric": "vocoder_longrun_quality",
                    "family": family, "step": target, "iterate": tag,
                    "ema_decay": ema_decay, "batch": batch,
                    "train_wall_s": round(wall, 1),
                    **score(params),
                }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
