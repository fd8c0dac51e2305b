"""HiFi-GAN vocoder training on TPU (generator + MPD/MSD discriminators).

BEYOND-REFERENCE extension (see models/hifigan_disc.py): the reference can
only *download* its vocoder (setup.sh:1-5); this trainer lets the
framework produce one from corpus audio, so a stripped/unavailable
checkpoint is no longer a hard dependency.

TPU-first design:
  * ONE jit step runs the whole GAN update — generator forward, the
    discriminator update on stop-gradient'd audio, then the generator
    update (adversarial + feature-matching + 45x mel L1) reusing the same
    generated waveform, exactly the official update order (hifi-gan
    train.py). The generator runs ONCE per step: its forward's jax.vjp is
    saved across the D update and closed by the G update (gen_params are
    untouched by the D step, so this is numerically identical to the
    recompute formulation — pinned by a test — minus one full G forward
    of FLOPs). Both Adam states live in a single donated TrainState, so
    the update is in-place in HBM.
  * The mel loss recomputes log-mel from waveforms inside the step with
    the framework's own fused DSP (`ops/stft.logmel_and_energy`) — the
    same natural-log, 1e-5-clamped mel domain the acoustic model is
    trained on, so a vocoder trained here is domain-consistent with
    `Synthesizer`.
  * Fixed segment shapes (default 8192 samples = 32 mel frames) keep one
    executable for the whole run; batches shard over the 1-D `data` mesh
    like the acoustic trainer.

The trained generator pytree is `HiFiGANGenerator`'s own, so checkpoints
plug directly into `vocoder_infer` / `Synthesizer`.
"""
from __future__ import annotations

import dataclasses
import functools
import json
import math
import pathlib
import time
from typing import Any, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
from visual_onoma_to_wave_tpu.models.hifigan_disc import (
    MultiPeriodDiscriminator, MultiScaleDiscriminator, discriminator_loss,
    feature_matching_loss, generator_adversarial_loss)
from visual_onoma_to_wave_tpu.ops.stft import hann_window, logmel_and_energy, melscale_fbanks


@dataclasses.dataclass(frozen=True)
class VocoderTrainConfig:
    """Training hyper-parameters (defaults = HiFi-GAN V1 recipe)."""

    segment_size: int = 8192          # samples per training segment
    batch_size: int = 16
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999           # per lr_decay_steps
    lr_decay_steps: int = 1000        # ~per-epoch decay of the official recipe
    mel_loss_weight: float = 45.0
    total_steps: int = 200_000
    log_every: int = 100
    save_every: int = 10_000
    seed: int = 0
    # audio/DSP (must match the acoustic model's domain)
    sampling_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    f_min: float = 0.0
    f_max: float = 8000.0
    # "bfloat16" = mixed-precision GAN step: G/D convs compute at bf16 with
    # f32 accumulation; params, optimizer, losses and the mel DSP stay f32.
    # Measured ~1.25x step time on v5e at B=16x8192 with matched-budget
    # quality parity (benchmarks/bench_vocoder_train.py --bf16,
    # bench_vocoder_quality.py --bf16; docs/PERF.md).
    compute_dtype: str = "float32"
    # Exponential moving average of the GENERATOR params (beyond the
    # official recipe, which serves the raw last iterate): 0.0 = off
    # (official behaviour); 0.999-0.9999 = on. The EMA tree updates inside
    # the same donated jit step (one extra elementwise pass over the 14 M
    # generator params, ~0 cost vs the 100+ ms GAN step) and is saved as
    # <step>/generator_ema next to the raw generator — GANs' noisy
    # adversarial updates make the averaged iterate the better serving
    # artifact. Choose decay ~ 1 - 1/expected_steps x 10: 0.999 for
    # few-thousand-step runs, 0.9999 for the full 200 k recipe.
    ema_decay: float = 0.0
    # Global-norm gradient clipping applied to BOTH the generator and the
    # discriminator updates; 0.0 = off (the official HiFi-GAN recipe).
    # The BigVGAN recipe needs it: at HiFi-GAN's flat 2e-4 the BigVGAN
    # generator diverges to tanh rails within ~1k steps (measured,
    # docs/PERF.md) — the paper's fix is lr=1e-4 + clip=1e3 (the
    # `cli train-vocoder --family bigvgan` default).
    grad_clip_norm: float = 0.0
    # Divergence watchdog (evaluated at log_every cadence). GAN collapse is
    # SILENT: in the measured 20k-step arms (BASELINE.md) a collapsed
    # generator freezes to a constant output and training happily burns
    # chips for the remaining 12k+ steps. Detection: any non-finite loss,
    # or mel_l1 staying above divergence_factor x the running best for
    # divergence_patience consecutive log windows. Margins validated
    # against all six 20k arms: healthy GAN noise stays <= ~2x best
    # (HiFi-GAN V1/V2 worst case), collapse sits at 8-10x.
    # on_divergence: "warn" prints + logs once; "halt" also checkpoints
    # and stops the run (trainer.diverged_at records the step).
    divergence_factor: float = 4.0
    divergence_patience: int = 5
    on_divergence: str = "halt"        # "halt" | "warn"
    # Secondary collapse triggers. The factor-over-best rule alone misses
    # an EARLY collapse: before mel_l1 ever converges, the running best IS
    # the collapsed level (BigVGAN's flat-recipe tanh rails sit at mel L1
    # ~2.0-2.2 with finite losses from ~1k steps — docs/PERF.md), so
    # 4x-best never trips. Two additional signals:
    #  * absolute ceiling: once past divergence_warmup_windows log
    #    windows, a NON-improving window (no new running-best) with
    #    mel_l1 above divergence_mel_ceiling counts as bad — every
    #    measured healthy arm is well under 1.5 within a few hundred
    #    steps while the measured collapses pin >= 2.0 and stop setting
    #    record minima (BASELINE.md 20k arms). The new-best reset keeps
    #    a corpus that legitimately trains through/above 1.5 alive; a
    #    corpus whose CONVERGED mel_l1 sits above the ceiling should
    #    raise divergence_mel_ceiling (or set it 0 = off) explicitly.
    #  * frozen metrics: mel_l1 bit-identical across frozen_patience+1
    #    consecutive windows — random segment sampling makes a healthy
    #    (even plateaued) run's per-window loss vary, so exact repetition
    #    means the output (or the device) is stuck.
    divergence_mel_ceiling: float = 1.5
    divergence_warmup_windows: int = 10
    frozen_patience: int = 3
    # Rolling last-healthy snapshot (halt mode only): every N healthy log
    # windows, keep a host-side copy of the generator (+EMA) so the halt
    # checkpoint can include a usable `generator_last_healthy` artifact —
    # the state at the halt step is already diverged, and with a large
    # save_every no earlier periodic checkpoint may exist. 0 = off.
    healthy_snapshot_windows: int = 20


def family_recipe(family: str) -> dict:
    """Measured-safe default training recipe for a generator family:
    ``{"learning_rate", "grad_clip_norm", "disc"}``.

    The flat HiFi-GAN recipe (lr 2e-4, no clip, MPD+MSD — hifi-gan
    train.py via /root/reference/scripts/hifigan) is NOT universally
    stable: BigVGAN diverges to tanh rails within ~1k steps under it
    (measured, docs/PERF.md), so the bigvgan families default to the
    paper recipe (lr 1e-4 + global-norm clip 1e3 + MPD+MRD). The
    20k-step long-run arms (BASELINE.md) showed iSTFTNet-mel collapses
    the same way at ~7-8k steps under the flat recipe, and the round-5
    stabilized-recipe arm (lr 1e-4 + clip 1e3, MPD+MSD) ran the same
    20k healthily with BETTER quality from 4k on (mrstft 3.83-4.1 vs
    the flat arm's 4.10-4.39 pre-collapse band) — so the istftnet
    families default to that measured-safe recipe (shared iSTFT head
    ⇒ shared risk; Vocos also has the head but its flat 20k arm was
    healthy, so it keeps the flat default). Explicit CLI flags /
    config values always override these defaults.
    """
    f = family.lower().replace("-", "").replace("_", "")
    if f.startswith("bigvgan"):
        return {"learning_rate": 1e-4, "grad_clip_norm": 1e3,
                "disc": "mrd"}
    if f.startswith("istftnet"):
        return {"learning_rate": 1e-4, "grad_clip_norm": 1e3,
                "disc": "msd"}
    return {"learning_rate": 2e-4, "grad_clip_norm": 0.0, "disc": "msd"}


@flax.struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    gen_params: Any
    mpd_params: Any
    msd_params: Any
    gen_opt: Any
    disc_opt: Any
    # EMA of gen_params (None when cfg.ema_decay == 0 — an empty pytree
    # node, so ema-off states remain checkpoint-compatible with states
    # saved before this field existed)
    gen_ema: Any = None


class SegmentSampler:
    """Random fixed-size audio segments from a list of clips (host side).

    Clips shorter than segment_size are zero-padded (official behaviour).
    """

    def __init__(self, clips: Sequence[np.ndarray], cfg: VocoderTrainConfig):
        if not clips:
            raise ValueError("no training clips")
        self.clips = [np.asarray(c, np.float32).reshape(-1) for c in clips]
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)

    def next_batch(self) -> np.ndarray:
        s = self.cfg.segment_size
        out = np.zeros((self.cfg.batch_size, s), np.float32)
        idx = self.rng.integers(0, len(self.clips), self.cfg.batch_size)
        for i, ci in enumerate(idx):
            clip = self.clips[ci]
            if len(clip) > s:
                start = int(self.rng.integers(0, len(clip) - s + 1))
                out[i] = clip[start:start + s]
            else:
                out[i, :len(clip)] = clip
        return out


class PairedSegmentSampler:
    """Aligned (audio, mel) segments for vocoder FINE-TUNING.

    pairs: list of (audio (S,), mel (T, n_mels)) with mel frame t covering
    samples [t*hop, (t+1)*hop) — e.g. the acoustic model's teacher-forced
    postnet mels for the corpus clips (official HiFi-GAN fine-tuning).
    Segments are cut on frame boundaries so the pair stays aligned.
    """

    def __init__(self, pairs, cfg: VocoderTrainConfig):
        if not pairs:
            raise ValueError("no training pairs")
        if cfg.segment_size % cfg.hop_length:
            raise ValueError("segment_size must be a hop multiple")
        self.cfg = cfg
        self.rng = np.random.default_rng(cfg.seed)
        self.pairs = []
        t_seg = cfg.segment_size // cfg.hop_length
        for audio, mel in pairs:
            audio = np.asarray(audio, np.float32).reshape(-1)
            mel = np.asarray(mel, np.float32)
            t = min(len(audio) // cfg.hop_length, mel.shape[0])
            if t < 1:
                continue
            self.pairs.append((audio[:t * cfg.hop_length], mel[:t]))
        if not self.pairs:
            raise ValueError("all pairs shorter than one hop")
        self.t_seg = t_seg

    def next_batch(self):
        c = self.cfg
        audio = np.zeros((c.batch_size, c.segment_size), np.float32)
        mel = np.full((c.batch_size, self.t_seg, c.n_mels),
                      float(np.log(1e-5)), np.float32)  # log-clamp silence
        idx = self.rng.integers(0, len(self.pairs), c.batch_size)
        for i, pi in enumerate(idx):
            a, m = self.pairs[pi]
            t = m.shape[0]
            if t > self.t_seg:
                f0 = int(self.rng.integers(0, t - self.t_seg + 1))
                mel[i] = m[f0:f0 + self.t_seg]
                audio[i] = a[f0 * c.hop_length:
                             f0 * c.hop_length + c.segment_size]
            else:
                mel[i, :t] = m
                audio[i, :t * c.hop_length] = a
        return audio, mel.transpose(0, 2, 1)            # mel: (B, n_mels, T)


def teacher_forced_pairs(trainer, limit: int | None = None):
    """Export (audio, predicted_mel) fine-tuning pairs from a trained
    acoustic model.

    Runs the acoustic model teacher-forced (ground-truth durations) over
    the train split and pairs each postnet mel with the preprocessor's
    saved trimmed waveform — requires `Preprocessor(..., save_audio=True)`
    (`cli preprocess --save-audio`). Rows without audio on disk (the
    feature-space augmentations) are skipped. Feed the result to
    `VocoderTrainer(pairs=...)` — the official HiFi-GAN fine-tuning
    recipe, closing the predicted-mel domain gap for `Synthesizer`.
    """
    import jax

    from visual_onoma_to_wave_tpu.training.trainer import _jit_batch

    if jax.process_count() > 1:
        raise ValueError(
            "teacher_forced_pairs reads per-item model outputs and is "
            "single-process: export the pairs on one host (they are plain "
            "arrays), then train the vocoder distributed")
    root = pathlib.Path(trainer.config.path.preprocessed)
    labels = {name: label for name, label, *_ in trainer.train_ds.rows}
    pairs = []
    for batch in trainer.train_ds.batches(group_size=1, shuffle=False):
        jb = trainer._place(_jit_batch(batch))
        _, outputs = trainer.eval_step(trainer.state, jb)
        mels = np.asarray(jax.device_get(outputs["postnet_mel"]),
                          np.float32)                    # (B, T, n_mels)
        lens = np.asarray(jax.device_get(outputs["mel_lens"]))
        for i, name in enumerate(batch["names"]):
            p = root / "audio" / labels[name] / f"{name}.npy"
            if not p.exists():
                continue
            pairs.append((np.load(p), mels[i, :int(lens[i])]))
            if limit and len(pairs) >= limit:
                return pairs
    return pairs


def load_wav_dir(wav_dir: str | pathlib.Path, limit: int | None = None,
                 target_sr: int = 22050):
    """Load all .wav files under a directory as float32 [-1, 1] arrays,
    resampled to target_sr."""
    from visual_onoma_to_wave_tpu.data.audio_io import load_audio

    paths = sorted(pathlib.Path(wav_dir).rglob("*.wav"))
    if limit:
        paths = paths[:limit]
    return [load_audio(p, target_sr) for p in paths]


def make_gan_train_step(gen: HiFiGANGenerator,
                        mpd: MultiPeriodDiscriminator,
                        msd,  # MSD or any same-interface module (e.g. MRD)
                        gen_tx: optax.GradientTransformation,
                        disc_tx: optax.GradientTransformation,
                        cfg: VocoderTrainConfig):
    """Build the jitted GAN step: D update then G update, one executable."""
    window = jnp.asarray(hann_window(cfg.win_length))
    fb = jnp.asarray(melscale_fbanks(cfg.n_fft // 2 + 1, cfg.f_min, cfg.f_max,
                                     cfg.n_mels, cfg.sampling_rate))

    t_mel = cfg.segment_size // cfg.hop_length

    def mel_of(audio):
        logmel, _ = logmel_and_energy(audio, window, fb, cfg.n_fft,
                                      cfg.hop_length, cfg.win_length)
        # center=True framing yields T+1 frames for T*hop samples; keep the
        # first T so generator output length == segment length exactly
        return logmel[..., :t_mel]                     # (B, n_mels, T)

    def disc_loss_fn(dparams, y, y_hat):
        mpd_p, msd_p = dparams
        pr, pg, _, _ = mpd.apply({"params": mpd_p}, y, y_hat)
        sr, sg, _, _ = msd.apply({"params": msd_p}, y, y_hat)
        loss_p = discriminator_loss(pr, pg)
        loss_s = discriminator_loss(sr, sg)
        return loss_p + loss_s, {"d_mpd": loss_p, "d_msd": loss_s}

    def gen_loss_of_yhat(y_hat, dparams, mel_target, y):
        """Generator loss as a function of the generated WAVEFORM (not the
        generator params): lets the step reuse the single G forward from the
        D phase — grads w.r.t. gen_params come from chaining this loss's
        d(loss)/d(y_hat) through the saved jax.vjp of that forward."""
        mpd_p, msd_p = dparams
        mel_hat = mel_of(y_hat)
        mel_l1 = jnp.mean(jnp.abs(mel_hat - mel_target))
        pr, pg, fpr, fpg = mpd.apply({"params": mpd_p}, y, y_hat)
        sr, sg, fsr, fsg = msd.apply({"params": msd_p}, y, y_hat)
        adv = generator_adversarial_loss(pg) + generator_adversarial_loss(sg)
        fm = feature_matching_loss(fpr, fpg) + feature_matching_loss(fsr, fsg)
        total = adv + fm + cfg.mel_loss_weight * mel_l1
        aux = {"g_adv": adv, "g_fm": fm, "mel_l1": mel_l1, "g_total": total}
        return total, aux

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: GANTrainState, audio: jnp.ndarray, mel=None):
        """audio: (B, segment_size) float32 in [-1, 1].

        mel: optional (B, n_mels, segment/hop) generator INPUT. When None
        (from-scratch training) it is the audio's own log-mel; pass the
        acoustic model's teacher-forced predictions for the official
        fine-tuning recipe (closes the predicted-mel domain gap). The mel
        L1 target is always computed from the real audio.
        """
        mel_target = mel_of(audio)                      # (B, n_mels, T)
        mel_in = mel_target if mel is None else mel

        # ONE generator forward serves both phases: its value feeds the D
        # update (G frozen there), and its saved vjp closes the G update —
        # gen_params are unchanged by the D step, so this is numerically
        # identical to recomputing the forward inside the G loss, minus a
        # full G forward of FLOPs per step.
        y_hat, gen_vjp = jax.vjp(
            lambda gp: gen.apply(gp, mel_in.swapaxes(1, 2)), state.gen_params)
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        (d_total, d_aux), d_grads = jax.value_and_grad(
            disc_loss_fn, has_aux=True)(
                (state.mpd_params, state.msd_params), audio, y_hat_sg)
        d_updates, disc_opt = disc_tx.update(
            d_grads, state.disc_opt, (state.mpd_params, state.msd_params))
        mpd_params, msd_params = optax.apply_updates(
            (state.mpd_params, state.msd_params), d_updates)

        # G update against the freshly-updated discriminators:
        # d(loss)/d(y_hat) chained through the saved forward's vjp
        (g_total, g_aux), g_grad_yhat = jax.value_and_grad(
            gen_loss_of_yhat, has_aux=True)(
                y_hat, (mpd_params, msd_params), mel_target, audio)
        (g_grads,) = gen_vjp(g_grad_yhat)
        g_updates, gen_opt = gen_tx.update(
            g_grads, state.gen_opt, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)

        if cfg.ema_decay > 0.0:
            d = cfg.ema_decay
            gen_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                   state.gen_ema, gen_params)
        else:
            gen_ema = state.gen_ema

        new_state = GANTrainState(
            step=state.step + 1, gen_params=gen_params,
            mpd_params=mpd_params, msd_params=msd_params,
            gen_opt=gen_opt, disc_opt=disc_opt, gen_ema=gen_ema)
        metrics = {"d_total": d_total, **d_aux, **g_aux}
        return new_state, metrics

    return train_step


class VocoderTrainer:
    """Drives GAN training of a vocoder generator (HiFi-GAN by default;
    any module whose total_upsample == hop_length works, e.g. the
    iSTFT-head families in models/istftnet.py).

    clips: iterable of float32 waveforms in [-1, 1] at cfg.sampling_rate
    (e.g. `load_wav_dir(...)` over the corpus' formatted wav/ directory).

    `msd` accepts any module with the MSD's (y, y_hat) -> (real_logits,
    gen_logits, real_fmaps, gen_fmaps) interface — pass
    `MultiResolutionDiscriminator()` for the UnivNet/BigVGAN MPD+MRD
    recipe (`cli train-vocoder --disc mrd`).
    """

    def __init__(self, clips: Sequence[np.ndarray] | None,
                 cfg: VocoderTrainConfig | None = None,
                 gen: HiFiGANGenerator | None = None,
                 ckpt_dir: str | pathlib.Path | None = None,
                 log_dir: str | pathlib.Path | None = None,
                 use_mesh: bool = True,
                 mpd: MultiPeriodDiscriminator | None = None,
                 msd=None,
                 pairs=None):
        self.cfg = cfg or VocoderTrainConfig()
        if not 0.0 <= self.cfg.ema_decay < 1.0:
            # decay 1.0 would freeze the EMA at the random init (and >1
            # diverges) while still writing generator_ema artifacts
            raise ValueError(
                f"ema_decay must be in [0, 1), got {self.cfg.ema_decay}")
        from visual_onoma_to_wave_tpu.utils.compile_cache import (
            enable_persistent_cache)
        enable_persistent_cache()
        dtype = jnp.dtype(self.cfg.compute_dtype)
        self.gen = gen if gen is not None else HiFiGANGenerator(dtype=dtype)
        self.mpd = mpd or MultiPeriodDiscriminator(dtype=dtype)
        self.msd = msd or MultiScaleDiscriminator(dtype=dtype)
        if pairs is not None:  # fine-tuning on (audio, predicted-mel) pairs
            self.sampler = PairedSegmentSampler(pairs, self.cfg)
        else:
            self.sampler = SegmentSampler(clips, self.cfg)
        self.ckpt_dir = pathlib.Path(ckpt_dir) if ckpt_dir else None
        # divergence watchdog state (see VocoderTrainConfig.on_divergence)
        self.diverged_at: int | None = None
        self._best_mel_l1 = float("inf")
        self._bad_windows = 0
        self._windows_seen = 0
        self._last_mel: float | None = None
        self._frozen_windows = 0
        self._healthy_windows = 0
        # (step, gen_params host tree, gen_ema host tree | None)
        self._healthy_snapshot: tuple | None = None
        if self.cfg.on_divergence not in ("warn", "halt"):
            raise ValueError(
                f"on_divergence must be 'warn' or 'halt', "
                f"got {self.cfg.on_divergence!r}")
        self.log = None
        if log_dir is not None:
            # primary-only under multi-host (the log dir is shared storage)
            from visual_onoma_to_wave_tpu.parallel import is_primary
            if is_primary():
                from visual_onoma_to_wave_tpu.utils.logging import (
                    MetricsLogger)
                self.log = MetricsLogger(log_dir, name="vocoder")

        c = self.cfg
        sched = optax.exponential_decay(
            c.learning_rate, transition_steps=c.lr_decay_steps,
            decay_rate=c.lr_decay, staircase=True)
        def _tx():
            adam = optax.adamw(sched, b1=c.adam_b1, b2=c.adam_b2,
                               weight_decay=0.01)
            if c.grad_clip_norm > 0.0:
                return optax.chain(
                    optax.clip_by_global_norm(c.grad_clip_norm), adam)
            return adam
        self.gen_tx = _tx()
        self.disc_tx = _tx()

        rng = jax.random.PRNGKey(c.seed)
        rg, rp, rs = jax.random.split(rng, 3)
        t_mel = c.segment_size // c.hop_length
        mel0 = jnp.zeros((1, t_mel, c.n_mels), jnp.float32)
        wav0 = jnp.zeros((1, c.segment_size), jnp.float32)
        # generator output length must equal the segment for the GAN losses
        # (total_upsample covers iSTFT-head families whose deterministic
        # head upsamples beyond prod(upsample_rates); models/istftnet.py)
        up = int(self.gen.total_upsample
                 if hasattr(self.gen, "total_upsample")
                 else np.prod(self.gen.upsample_rates))
        if up != c.hop_length:
            raise ValueError(
                f"generator upsampling {up} != hop_length {c.hop_length}")
        # jit the inits: eager op-by-op init is minutes-slow on the tunneled
        # TPU platform (CLAUDE.md gotchas)
        gen_params = jax.jit(self.gen.init)(rg, mel0)
        mpd_params = jax.jit(self.mpd.init)(rp, wav0, wav0)["params"]
        msd_params = jax.jit(self.msd.init)(rs, wav0, wav0)["params"]
        self.state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            mpd_params=mpd_params, msd_params=msd_params,
            gen_opt=self.gen_tx.init(gen_params),
            disc_opt=self.disc_tx.init((mpd_params, msd_params)),
            # EMA seeded at the init point (standard GAN-EMA practice; the
            # first averaged iterates are dominated by recent steps anyway).
            # Must be a COPY: the step donates the state, and aliased
            # gen_params/gen_ema leaves would donate one buffer twice.
            gen_ema=(jax.tree.map(jnp.copy, gen_params)
                     if c.ema_decay > 0.0 else None))
        self.train_step = make_gan_train_step(
            self.gen, self.mpd, self.msd, self.gen_tx, self.disc_tx, c)

        self.mesh = None
        self.n_proc = jax.process_count()
        if self.n_proc > 1:
            # multi-host GAN training: same global-mesh layout as the
            # acoustic Trainer (parallel/distributed.py) — every process's
            # chips join one data mesh, the seeded sampler makes all hosts
            # agree on the batch, each host feeds its own row slice
            if not use_mesh:
                raise ValueError(
                    "multi-process vocoder training requires use_mesh=True")
            if c.batch_size % jax.device_count():
                raise ValueError(
                    f"batch_size {c.batch_size} must divide by the global "
                    f"device count {jax.device_count()} "
                    f"({self.n_proc} processes)")
            from visual_onoma_to_wave_tpu.parallel import replicate
            from visual_onoma_to_wave_tpu.parallel.mesh import get_mesh
            self.mesh = get_mesh()
            self.state = replicate(jax.device_get(self.state), self.mesh)
        elif use_mesh and jax.device_count() > 1:
            from visual_onoma_to_wave_tpu.parallel.mesh import (
                batch_sharding, get_mesh)
            if c.batch_size % jax.device_count() == 0:
                self.mesh = get_mesh()
                self._sharding = batch_sharding(self.mesh)
            else:
                print(f"[vocoder] batch {c.batch_size} not divisible by "
                      f"{jax.device_count()} devices; training single-device")

    def _place(self, audio: np.ndarray) -> jnp.ndarray:
        if self.mesh is not None and self.n_proc > 1:
            from visual_onoma_to_wave_tpu.parallel import (
                shard_batch_multiprocess)
            return shard_batch_multiprocess(np.asarray(audio), self.mesh)
        x = jnp.asarray(audio)
        if self.mesh is not None:
            x = jax.device_put(x, self._sharding)
        return x

    def save(self, step: int) -> None:
        """Write <ckpt>/<step>/{generator[, generator_ema], full_state}.

        `generator` is the serving artifact (loads via Synthesizer /
        vocoder_infer / cli --vocoder); with cfg.ema_decay > 0,
        `generator_ema` is the averaged-iterate artifact in the same
        format (usually the better one to serve). `full_state` carries
        both optimizers, the discriminators and the EMA tree for exact
        resume — resume with the same ema_decay on/off setting the run
        was saved with.
        """
        if self.ckpt_dir is None:
            return
        from visual_onoma_to_wave_tpu.parallel import is_primary
        from visual_onoma_to_wave_tpu.utils.checkpoint import save_params
        d = self.ckpt_dir / f"{step}"
        # Orbax saves are collective under multi-host: EVERY process calls
        # them (orbax elects the writer and syncs internally); save_params
        # pulls arrays to host first, so checkpoints stay portable
        save_params(d / "generator", self.state.gen_params)
        if self.state.gen_ema is not None:
            save_params(d / "generator_ema", self.state.gen_ema)
        save_params(d / "full_state", self.state)
        if is_primary():
            # the host-side sampler RNG is part of the training state:
            # without it a resumed run would REPLAY the segment stream
            (d / "sampler_state.json").write_text(
                json.dumps(self.sampler.rng.bit_generator.state))

    def restore(self, step: int | None = None) -> int:
        """Resume from <ckpt>/<step>/full_state (latest step if None).

        Restores generator, discriminators, both Adam states, the schedule
        position and the sampler's RNG stream position (so resumed training
        sees the segments an uninterrupted run would have). Returns the
        restored step.
        """
        if self.ckpt_dir is None:
            raise ValueError("no ckpt_dir configured")
        from visual_onoma_to_wave_tpu.utils.checkpoint import load_params
        if step is None:
            steps = sorted(int(p.name) for p in self.ckpt_dir.iterdir()
                           if p.is_dir() and p.name.isdigit())
            if not steps:
                raise FileNotFoundError(f"no checkpoints in {self.ckpt_dir}")
            step = steps[-1]
        if (self.ckpt_dir / f"{step}" / "HALTED.json").exists():
            # this checkpoint is the watchdog's DIVERGED halt state —
            # resuming it would burn budget on a collapsed run with a
            # reset watchdog. Serve/fine-tune from the
            # generator_last_healthy artifact saved next to it, or
            # restore an earlier periodic step explicitly.
            raise ValueError(
                f"checkpoint {self.ckpt_dir / str(step)} is a divergence "
                f"halt state (HALTED.json present) — not resumable; use "
                f"the generator_last_healthy artifact beside it or an "
                f"earlier periodic step")
        self.state = load_params(self.ckpt_dir / f"{step}" / "full_state",
                                 template=jax.device_get(self.state))
        if self.n_proc > 1:
            # every process restored the same host tree from the shared
            # dir; put it back as one global replicated state
            from visual_onoma_to_wave_tpu.parallel import replicate
            self.state = replicate(self.state, self.mesh)
        sampler_state = self.ckpt_dir / f"{step}" / "sampler_state.json"
        if sampler_state.exists():
            self.sampler.rng.bit_generator.state = json.loads(
                sampler_state.read_text())
        return int(self.state.step)

    def _check_divergence(self, step: int, m: dict) -> bool:
        """Update watchdog state from one log window's metrics; return True
        the first time divergence is detected. Triggers:
          * non-finite losses — immediate;
          * LATE collapse: mel_l1 above divergence_factor x the running
            best for divergence_patience consecutive windows (ordinary GAN
            noise recovers within one or two — measured margins in the
            VocoderTrainConfig docstring);
          * EARLY collapse: past divergence_warmup_windows, mel_l1 above
            the absolute divergence_mel_ceiling counts as a bad window
            even while it is still the running best (a flat-recipe BigVGAN
            rails out at ~2.0-2.2 before any healthy best exists);
          * frozen metrics: mel_l1 bit-identical across frozen_patience+1
            consecutive windows.
        """
        if self.diverged_at is not None:
            return False                       # already fired once
        c = self.cfg
        vals = [m.get(k) for k in ("mel_l1", "g_total", "d_total")]
        finite = all(v is not None and math.isfinite(v) for v in vals)
        mel = m.get("mel_l1")
        self._windows_seen += 1
        if finite and self._last_mel is not None and mel == self._last_mel:
            self._frozen_windows += 1
        else:
            self._frozen_windows = 0
        self._last_mel = mel if finite else None
        if not finite:
            self._bad_windows = c.divergence_patience      # no recovery
        else:
            if mel < self._best_mel_l1:
                self._best_mel_l1 = mel
                bad = False
                improved = True
            else:
                bad = mel > c.divergence_factor * self._best_mel_l1
                improved = False
            if (not improved
                    and self._windows_seen > c.divergence_warmup_windows
                    and mel > c.divergence_mel_ceiling):
                # early collapse — but only on NON-improving windows: the
                # 1.5 ceiling is calibrated on the bench corpora, and a
                # real corpus legitimately descending through (or noisily
                # plateaued above) that level keeps resetting the streak
                # with new bests, while measured rails (BigVGAN tanh
                # collapse pinned at ~2.0-2.2) set new record minima far
                # too rarely to escape patience consecutive bad windows
                bad = True
            self._bad_windows = self._bad_windows + 1 if bad else 0
        if (self._bad_windows < c.divergence_patience
                and self._frozen_windows < c.frozen_patience):
            return False
        self.diverged_at = step
        return True

    def _maybe_snapshot_healthy(self) -> None:
        """Halt-mode rolling snapshot: keep a host-side generator (+EMA)
        copy every healthy_snapshot_windows fully-healthy log windows so a
        later halt can write `generator_last_healthy` (the halt-step state
        is already diverged; with a large save_every no earlier periodic
        checkpoint may exist — ADVICE r04)."""
        c = self.cfg
        if (c.on_divergence != "halt" or c.healthy_snapshot_windows <= 0
                or self.ckpt_dir is None or self.diverged_at is not None
                or self._bad_windows or self._frozen_windows):
            return
        self._healthy_windows += 1
        if self._healthy_windows % c.healthy_snapshot_windows:
            return
        step = int(jax.device_get(self.state.step))
        ema = (jax.device_get(self.state.gen_ema)
               if self.state.gen_ema is not None else None)
        self._healthy_snapshot = (
            step, jax.device_get(self.state.gen_params), ema)

    def _save_last_healthy(self, halt_step: int) -> str:
        """Write the rolling healthy snapshot (if any) next to the halt
        checkpoint as `generator_last_healthy[_ema]`; returns a one-line
        description for the halt message."""
        if self.ckpt_dir is None:
            return "no ckpt_dir configured"
        if self._healthy_snapshot is None:
            return ("no healthy snapshot was taken "
                    "(healthy_snapshot_windows=0 or the run never completed "
                    "a healthy window) — restart from the last periodic "
                    "checkpoint")
        from visual_onoma_to_wave_tpu.utils.checkpoint import save_params
        hstep, hgen, hema = self._healthy_snapshot
        d = self.ckpt_dir / f"{halt_step}"
        save_params(d / "generator_last_healthy", hgen)
        if hema is not None:
            save_params(d / "generator_last_healthy_ema", hema)
        return (f"generator_last_healthy (step {hstep}) is saved alongside "
                f"it — serve/resume from that artifact")

    def train(self, steps: int | None = None) -> GANTrainState:
        """Train until state.step reaches `steps` (cfg.total_steps default) —
        total-step semantics, so a restored trainer continues seamlessly."""
        c = self.cfg
        if self.diverged_at is not None and c.on_divergence == "halt":
            # a halted trainer stays halted: callers that drive train() in
            # increments (the long-run benches) must not silently resume
            # burning steps on a collapsed run
            return self.state
        target = steps if steps is not None else c.total_steps
        step = int(jax.device_get(self.state.step))
        done0 = step
        t0 = time.perf_counter()
        while step < target:
            batch = self.sampler.next_batch()
            if isinstance(batch, tuple):               # paired fine-tuning
                audio, mel = batch
                self.state, metrics = self.train_step(
                    self.state, self._place(audio), self._place(mel))
            else:
                self.state, metrics = self.train_step(
                    self.state, self._place(batch))
            step += 1
            if step % c.log_every == 0 or step == target:
                m = {k: float(v) for k, v in jax.device_get(metrics).items()}
                rate = (step - done0) / (time.perf_counter() - t0)
                line = (f"vocoder step {step}: mel_l1={m['mel_l1']:.4f} "
                        f"g={m['g_total']:.3f} d={m['d_total']:.3f} "
                        f"({rate:.2f} steps/s)")
                print(line)
                if self.log is not None:
                    self.log.scalars(step, m, prefix="Vocoder")
                    self.log.text(line)
                if self._check_divergence(step, m):
                    warn = (f"vocoder DIVERGENCE detected at step {step}: "
                            f"mel_l1={m['mel_l1']:.4f} vs running best "
                            f"{self._best_mel_l1:.4f} (factor "
                            f"{c.divergence_factor}, patience "
                            f"{c.divergence_patience} windows). GAN collapse "
                            f"does not self-recover in the measured arms "
                            f"(BASELINE.md) — restart from a healthy "
                            f"checkpoint with grad_clip_norm=1e3 and/or a "
                            f"lower learning rate (family_recipe has the "
                            f"measured-safe defaults).")
                    print(warn)
                    if self.log is not None:
                        self.log.text(warn)
                    if c.on_divergence == "halt":
                        self.save(step)
                        note = self._save_last_healthy(step)
                        if self.ckpt_dir is not None:
                            # cross-process halt marker: restore() refuses
                            # to auto-resume a diverged state (GAN collapse
                            # does not self-recover, and a fresh process
                            # would reset the watchdog's running best so
                            # the factor trigger could never re-fire)
                            from visual_onoma_to_wave_tpu.parallel import (
                                is_primary)
                            if is_primary():
                                (self.ckpt_dir / f"{step}" /
                                 "HALTED.json").write_text(json.dumps(
                                     {"diverged_at": step,
                                      "mel_l1": m["mel_l1"]}))
                        print(f"vocoder halt: the step-{step} checkpoint is "
                              f"the DIVERGED state (forensics only); {note}")
                        return self.state
                else:
                    self._maybe_snapshot_healthy()
            if step % c.save_every == 0 or step == target:
                self.save(step)
        return self.state
