"""Matched-budget quality head-to-head of the vocoder families on TPU.

Trains HiFi-GAN V1, iSTFTNet C8C8I and iSTFTNet-mel FROM SCRATCH with the
same data, batch, step budget and GAN recipe (training/vocoder_trainer.py),
then scores copy-synthesis on held-out clips: vocode each clip's
ground-truth log-mel, re-analyze the generated waveform with the same DSP,
and report mel L1 + frame-aligned MCD vs the ground truth (metrics.py).
This gives the family speed table (benchmarks/bench_istftnet.py,
BASELINE.md) its quality counterpart: the fast iSTFT heads must land in
the same quality ballpark at a matched training budget, or the speedup is
not a free lunch. (The reference ships only the pretrained HiFi-GAN and no
objective quality metric at all — scripts/evaluate.py logs audio for human
listening.)

Corpus: deterministic structured clips at 22.05 kHz in the RWCP-SSD
domain the reference targets — damped harmonic bell strikes and
noise-burst drum hits with randomized pitch/decay/onsets; 24 clips,
4 held out (never sampled by the trainer).

Methodology per CLAUDE.md: everything device-side runs inside jit; syncs
go through device_get of the fetched arrays themselves (block_until_ready
is a no-op on the tunneled platform).

Usage:
    python benchmarks/bench_vocoder_quality.py [--steps N] \
        [--families hifigan,istftnet,istftnet-mel] [--batch N]
Prints one JSON line per family.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SR = 22050


def _clip(rng: np.random.Generator) -> np.ndarray:
    """One structured environmental-sound clip: 2-4 onsets, each a bell
    (harmonic stack, slow decay) or drum (noise burst + damped tone)."""
    n = int(rng.uniform(1.2, 1.8) * SR)
    out = np.zeros(n, np.float32)
    for _ in range(int(rng.integers(2, 5))):
        start = int(rng.uniform(0.0, 0.7) * n)
        dur = min(n - start, int(rng.uniform(0.25, 0.6) * SR))
        t = np.arange(dur) / SR
        f = float(rng.uniform(180.0, 900.0))
        if rng.uniform() < 0.5:  # bell
            env = np.exp(-t * rng.uniform(4.0, 9.0))
            tone = sum(a * np.sin(2 * np.pi * f * h * t)
                       for a, h in ((0.6, 1.0), (0.25, 2.76), (0.15, 5.40)))
        else:  # drum
            env = np.exp(-t * rng.uniform(14.0, 25.0))
            tone = (0.6 * np.sin(2 * np.pi * f * t)
                    + rng.normal(0, 0.3, dur) * np.exp(-t * 60.0))
        out[start:start + dur] += (0.6 * env * tone).astype(np.float32)
    return np.clip(out, -1.0, 1.0)


def jit_logmel(n_fft, hop, win, n_mels, f_min, f_max, sr):
    """Jitted batch log-mel analyzer over the package DSP — the ONE
    scoring-harness frontend shared by the quality, long-run, demo-gate
    and e2e-floor benches (a metric fix like the round-4 pad-bleed one
    must land in exactly one place)."""
    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.ops.stft import (
        hann_window, logmel_and_energy, melscale_fbanks)

    window = jnp.asarray(hann_window(win))
    fb = jnp.asarray(melscale_fbanks(n_fft // 2 + 1, f_min, f_max,
                                     n_mels, sr))

    @jax.jit
    def logmel(audio):
        m, _ = logmel_and_energy(audio, window, fb, n_fft, hop, win)
        return m                                        # (B, n_mels, T)
    return logmel


def corpus_and_gt(cfg):
    """Shared scoring harness (also used by bench_vocoder_longrun.py —
    keep the matched-budget and long-run numbers comparable by
    construction): the deterministic 24-clip corpus split into 20 train
    clips and 4 held-out (audio, ground-truth-mel) pairs, plus the jitted
    log-mel analyzer. Each held-out clip is trimmed to a whole number of
    hops so vocoded length == clip length exactly."""
    import jax
    import jax.numpy as jnp

    logmel = jit_logmel(cfg.n_fft, cfg.hop_length, cfg.win_length,
                        cfg.n_mels, cfg.f_min, cfg.f_max,
                        cfg.sampling_rate)

    rng = np.random.default_rng(0)
    clips = [_clip(rng) for _ in range(24)]
    train_clips, held_out = clips[:20], clips[20:]
    gt = []
    for c in held_out:
        t = len(c) // cfg.hop_length
        audio = c[: t * cfg.hop_length]
        mel = np.asarray(jax.device_get(logmel(jnp.asarray(audio)[None])))[0]
        gt.append((audio, mel))                         # mel: (n_mels, T)
    return train_clips, gt, logmel


def make_scorer(gen, gt, logmel):
    """score(params) -> copy-synthesis quality dict over the held-out
    clips: mel L1 + frame-aligned MCD (mel domain) and multi-resolution
    STFT distance (waveform domain — de-biases the mel metrics' favor
    toward magnitude-regressing heads; metrics.py)."""
    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.metrics import (
        mcd_frames, mel_l1, mrstft_distance)

    # params as jit ARGUMENTS, never closure/default-arg constants
    # (closed-over trees 413 the tunneled remote_compile endpoint)
    @jax.jit
    def vocode(params, mel_bt):
        return gen.apply(params, mel_bt)                # (B, T*hop)

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
    return score


def main() -> int:
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    steps = 2000
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    batch = 16
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    families = ["hifigan", "istftnet", "istftnet-mel"]
    if "--families" in sys.argv:
        families = sys.argv[sys.argv.index("--families") + 1].split(",")
    dtype = "bfloat16" if "--bf16" in sys.argv else "float32"
    ema_decay = 0.0
    if "--ema" in sys.argv:  # also scores the EMA iterate per family
        ema_decay = float(sys.argv[sys.argv.index("--ema") + 1])
    disc = "msd"
    if "--disc" in sys.argv:  # mrd = UnivNet/BigVGAN MPD+MRD recipe
        disc = sys.argv[sys.argv.index("--disc") + 1]
    gen_kwargs = {}
    if "--gen-kwargs" in sys.argv:  # e.g. '{"anti_aliased": false}'
        gen_kwargs = json.loads(sys.argv[sys.argv.index("--gen-kwargs") + 1])
    lr = 2e-4
    if "--lr" in sys.argv:  # BigVGAN recipe: 1e-4
        lr = float(sys.argv[sys.argv.index("--lr") + 1])
    clip = 0.0
    if "--clip" in sys.argv:  # BigVGAN recipe: 1e3
        clip = float(sys.argv[sys.argv.index("--clip") + 1])

    # watchdog armed with a <=250-step log cadence: effectively inert at
    # the default 2000-step budget (warmup 10 windows = 2.5k steps) but
    # stops a >=6k-step arm from burning its budget on a measured-style
    # collapse (BASELINE.md 20k arms)
    cfg = VocoderTrainConfig(total_steps=steps, batch_size=batch,
                             save_every=10 ** 9,
                             log_every=min(max(steps // 4, 1), 250),
                             compute_dtype=dtype, ema_decay=ema_decay,
                             on_divergence="halt",
                             learning_rate=lr, grad_clip_norm=clip)
    train_clips, gt, logmel = corpus_and_gt(cfg)

    msd = None
    if disc == "mrd":
        from visual_onoma_to_wave_tpu.models.hifigan_disc import (
            MultiResolutionDiscriminator)
        msd = MultiResolutionDiscriminator(dtype=jnp.dtype(dtype))

    for family in families:
        gen = (get_vocoder(family, dtype=jnp.dtype(dtype), **gen_kwargs)
               if family != "hifigan" else None)
        t0 = time.perf_counter()
        vt = VocoderTrainer(train_clips, cfg, gen=gen, msd=msd,
                            use_mesh=False)
        vt.train()
        train_s = time.perf_counter() - t0
        score = make_scorer(vt.gen, gt, logmel)

        variants = [("raw", vt.state.gen_params)]
        if vt.state.gen_ema is not None:
            variants.append(("ema", vt.state.gen_ema))
        for tag, params in variants:
            print(json.dumps({
                "metric": "vocoder_copy_synthesis_quality",
                "family": family, "steps": steps, "batch": batch,
                # a watchdog halt means the scores below are the COLLAPSED
                # state at diverged_at, not a steps-budget result
                **({"diverged_at": vt.diverged_at}
                   if vt.diverged_at is not None else {}),
                "dtype": dtype, "disc": disc, "iterate": tag,
                **({"gen_kwargs": gen_kwargs} if gen_kwargs else {}),
                **({"lr": lr} if lr != 2e-4 else {}),
                **({"clip": clip} if clip else {}),
                **({"ema_decay": ema_decay} if tag == "ema" else {}),
                "train_s": round(train_s, 1),
                "held_out_clips": len(gt),
                **score(params),
            }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
