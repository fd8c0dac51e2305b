"""TPU-native audio DSP: STFT, mel spectrogram, energy, spectral kurtosis.

Re-implements the semantics of the reference preprocessing DSP chain
(reference scripts/preprocessor/preprocessor.py:22-36, 323-357) — which uses
torchaudio.transforms.Spectrogram(n_fft=1024, win=1024, hop=256, power=1,
center=True) followed by MelScale(n_mels=80, norm="slaney", mel_scale="htk")
— as batched, jit-compiled JAX ops. Everything here is static-shaped and
vmappable; variable-length clips are handled by padding + masking on the host.

Key numerics to match (verified by golden tests vs torch.stft):
  * center=True  -> reflect-pad n_fft//2 on both sides
  * power=1      -> magnitude spectrogram
  * mel filterbank: HTK mel scale + slaney area-normalization
  * log-mel      -> log(clamp(mel, 1e-5))   (preprocessor.py:334-335)
  * energy       -> per-frame L2 norm of the magnitude spec (preprocessor.py:336)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Window + mel filterbank construction (host-side, float64 -> float32)
# ---------------------------------------------------------------------------

def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window, identical to torch.hann_window(win_length)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _hz_to_mel_htk(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Mel filterbank matrix of shape (n_freqs, n_mels).

    Matches torchaudio.functional.melscale_fbanks(..., norm="slaney",
    mel_scale="htk") — the exact configuration used by the reference
    (preprocessor.py:29-36): HTK frequency warping with slaney-style
    area normalization.
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    # triangular filters
    f_diff = f_pts[1:] - f_pts[:-1]                           # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]              # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))                # (n_freqs, n_mels)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# Core jitted DSP
# ---------------------------------------------------------------------------

def _reflect_pad_1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect padding along the last axis (torch 'reflect' semantics)."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def frame_signal(x: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Slice a (..., num_samples) signal into overlapping frames.

    Returns (..., n_frames, n_fft) where n_frames = num_samples // hop + 1
    given that x has already been center-padded by n_fft//2 on both sides.
    """
    num_samples = x.shape[-1]
    n_frames = (num_samples - n_fft) // hop_length + 1
    idx = (
        jnp.arange(n_frames, dtype=jnp.int32)[:, None] * hop_length
        + jnp.arange(n_fft, dtype=jnp.int32)[None, :]
    )
    return x[..., idx]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def magnitude_spectrogram(
    audio: jnp.ndarray,
    window: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
) -> jnp.ndarray:
    """Magnitude STFT matching torchaudio Spectrogram(power=1, center=True).

    audio: (..., num_samples) float32 in [-1, 1]
    returns: (..., n_freqs, n_frames) with n_freqs = n_fft//2 + 1,
             n_frames = num_samples // hop_length + 1.
    """
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    padded = _reflect_pad_1d(audio, n_fft // 2)
    frames = frame_signal(padded, n_fft, hop_length)           # (..., T, n_fft)
    frames = frames * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)              # (..., T, F)
    return jnp.abs(spec).astype(jnp.float32).swapaxes(-1, -2)  # (..., F, T)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length"))
def logmel_and_energy(
    audio: jnp.ndarray,
    window: jnp.ndarray,
    mel_fb: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
):
    """Log-mel spectrogram + per-frame L2 energy in one fused jit.

    Equivalent to reference _get_spec (preprocessor.py:323-337):
      mel   = log(clamp(fb^T @ |STFT|, 1e-5))         (n_mels, T)
      energy = ||  |STFT| ||_2 over freq               (T,)

    The mel projection is a (F, T)^T @ (F, M) matmul -> rides the MXU.
    """
    audio = jnp.clip(audio, -1.0, 1.0)
    mag = magnitude_spectrogram(audio, window, n_fft, hop_length, win_length)
    # (..., F, T) x (F, M) -> (..., M, T)
    mel = jnp.einsum("...ft,fm->...mt", mag, mel_fb)
    logmel = jnp.log(jnp.maximum(mel, 1.0e-5))
    energy = jnp.sqrt(jnp.sum(mag * mag, axis=-2))
    return logmel.astype(jnp.float32), energy.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "max_chars"))
def spectral_kurtosis(
    audio: jnp.ndarray,
    durations: jnp.ndarray,
    window: jnp.ndarray,
    max_chars: int,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
) -> jnp.ndarray:
    """Per-character spectral kurtosis via the log-moment estimator.

    Vectorized equivalent of reference _get_kurtosis (preprocessor.py:339-357),
    which Python-loops over characters slicing the power spectrogram. Here the
    frame->character map is built with searchsorted over cumsum(durations) and
    the per-segment sums ride jax.ops.segment_sum — O(T) with static shapes.

      gamma = log(mean(P_seg) + eps) - mean(log(P_seg + eps))
      eta   = (3 - gamma + sqrt((gamma-3)^2 + 24*gamma)) / (12*gamma)
      kurt  = (eta+2)*(eta+3) / (eta*(eta+1) + eps)

    audio:     (num_samples,) single clip (vmap for batches)
    durations: (max_chars,) int32, zero-padded
    returns:   (max_chars,) float32; entries with duration 0 are 0.
    """
    audio = jnp.clip(audio, -1.0, 1.0)
    mag = magnitude_spectrogram(audio, window, n_fft, hop_length, win_length)
    power = (mag * mag).astype(jnp.float32)          # (F, T)
    n_freqs = power.shape[0]
    p_sum_t = jnp.sum(power, axis=0)                  # (T,)
    logp_sum_t = jnp.sum(jnp.log(power + KURTOSIS_EPS), axis=0)
    # single estimator implementation (char_stats_from_frame_sums); the
    # unused energy output is DCE'd under jit
    _, kurt = char_stats_from_frame_sums(
        jnp.zeros_like(p_sum_t), p_sum_t, logp_sum_t, durations,
        max_chars=max_chars, n_freqs=n_freqs)
    return kurt


@functools.partial(jax.jit, static_argnames=("max_chars",))
def char_level_energy(
    energy: jnp.ndarray, durations: jnp.ndarray, max_chars: int
) -> jnp.ndarray:
    """Average frame-level energy into character-level energy.

    Equivalent of the in-place averaging loop at reference preprocessor.py:400-408:
    energy[i] = mean(frame_energy[pos:pos+d]) (0 when d == 0).

    energy:    (T,) frame-level L2 energies
    durations: (max_chars,) int32
    returns:   (max_chars,) float32
    """
    # single estimator implementation (char_stats_from_frame_sums); the
    # unused kurtosis output is DCE'd under jit
    zeros = jnp.zeros_like(energy)
    e, _ = char_stats_from_frame_sums(energy, zeros, zeros, durations,
                                      max_chars=max_chars, n_freqs=1)
    return e


@functools.partial(
    jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "max_chars")
)
def clip_features(
    prepadded_audio: jnp.ndarray,
    durations: jnp.ndarray,
    window: jnp.ndarray,
    mel_fb: jnp.ndarray,
    max_chars: int,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
):
    """Fused preprocessing features for one (or a vmapped batch of) clip(s).

    The magnitude spectrogram is computed ONCE and shared by the log-mel,
    char-level energy and spectral-kurtosis branches — the reference computes
    the STFT twice per clip (preprocessor.py:332 and :350).

    prepadded_audio: (..., L) float32, already reflect-padded by n_fft//2 on
        the host (so bucket zero-padding beyond the true length cannot
        perturb the reflect region) and zero-padded to the bucket length.
    durations: (..., max_chars) int32 zero-padded per-char frame counts.

    Returns (logmel (..., M, T), char_energy (..., max_chars),
             kurtosis (..., max_chars)) with T = (L - n_fft)//hop + 1;
    frames beyond sum(durations) are garbage-by-construction and must be
    truncated by the caller.
    """
    audio = jnp.clip(prepadded_audio, -1.0, 1.0)
    frames = frame_signal(audio, n_fft, hop_length) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.abs(spec).astype(jnp.float32).swapaxes(-1, -2)   # (..., F, T)

    mel = jnp.einsum("...ft,fm->...mt", mag, mel_fb)
    logmel = jnp.log(jnp.maximum(mel, 1.0e-5)).astype(jnp.float32)
    frame_energy = jnp.sqrt(jnp.sum(mag * mag, axis=-2))        # (..., T)

    power = mag * mag
    n_freqs = power.shape[-2]
    p_sum_t = jnp.sum(power, axis=-2)
    logp_sum_t = jnp.sum(jnp.log(power + KURTOSIS_EPS), axis=-2)

    per_clip = functools.partial(char_stats_from_frame_sums,
                                 max_chars=max_chars, n_freqs=n_freqs)
    if power.ndim == 2:
        char_energy, kurt = per_clip(frame_energy, p_sum_t, logp_sum_t, durations)
    else:
        char_energy, kurt = jax.vmap(per_clip)(
            frame_energy, p_sum_t, logp_sum_t, durations)
    return logmel, char_energy, kurt


KURTOSIS_EPS = 1e-8


def char_stats_from_frame_sums(frame_energy, p_sum_t, logp_sum_t, durations,
                               *, max_chars: int, n_freqs: int):
    """Char-level mean energy + spectral kurtosis from per-frame reductions.

    Only per-frame sums over frequency are needed, so callers (jnp path above,
    Pallas frontend in ops/pallas_mel.py) never keep the (F, T) spectrogram:
      frame_energy: (T,) L2 over freq;  p_sum_t: (T,) sum of |S|^2 over freq;
      logp_sum_t: (T,) sum of log(|S|^2 + eps) over freq.
    Same estimator as reference _get_kurtosis (preprocessor.py:339-357).
    """
    eps = KURTOSIS_EPS
    n_frames = frame_energy.shape[0]
    bounds = jnp.cumsum(durations)
    frame_idx = jnp.arange(n_frames, dtype=jnp.int32)
    char_of_frame = jnp.searchsorted(bounds, frame_idx, side="right")
    char_of_frame = jnp.where(frame_idx < bounds[-1], char_of_frame, max_chars)

    seg_e = jax.ops.segment_sum(frame_energy, char_of_frame,
                                num_segments=max_chars + 1)[:max_chars]
    d = durations.astype(jnp.float32)
    char_energy = jnp.where(d > 0, seg_e / jnp.where(d > 0, d, 1.0), 0.0)

    seg_p = jax.ops.segment_sum(p_sum_t, char_of_frame,
                                num_segments=max_chars + 1)[:max_chars]
    seg_logp = jax.ops.segment_sum(logp_sum_t, char_of_frame,
                                   num_segments=max_chars + 1)[:max_chars]
    counts = d * n_freqs
    safe = counts > 0
    denom = jnp.where(safe, counts, 1.0)
    gamma = jnp.log(seg_p / denom + eps) - seg_logp / denom
    eta = (3.0 - gamma + jnp.sqrt((gamma - 3.0) ** 2 + 24.0 * gamma)) / (12.0 * gamma)
    kurt = (eta + 2.0) * (eta + 3.0) / (eta * (eta + 1.0) + eps)
    kurt = jnp.where(safe, kurt, 0.0)
    return char_energy.astype(jnp.float32), kurt.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Griffin-Lim (legacy inverse path parity — reference audio/audio_processing.py:66-82)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "win_length", "n_iters"))
def griffin_lim(
    magnitudes: jnp.ndarray,
    window: jnp.ndarray,
    key: jax.Array,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_iters: int = 30,
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction from a magnitude spectrogram (F, T)."""
    f, t = magnitudes.shape
    angles = jax.random.uniform(key, (f, t), minval=-np.pi, maxval=np.pi)
    phase = jnp.exp(1j * angles)

    def istft(spec):
        # spec: (F, T) complex
        frames = jnp.fft.irfft(spec.T, n=n_fft, axis=-1) * window  # (T, n_fft)
        total = (t - 1) * hop_length + n_fft
        sig = jnp.zeros(total)
        wsum = jnp.zeros(total)
        idx = (
            jnp.arange(t)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
        ).reshape(-1)
        sig = sig.at[idx].add(frames.reshape(-1))
        wsum = wsum.at[idx].add(jnp.tile(window * window, (t,)))
        sig = sig / jnp.maximum(wsum, 1e-8)
        return sig[n_fft // 2 : total - n_fft // 2]

    def stft_phase(sig):
        padded = _reflect_pad_1d(sig, n_fft // 2)
        frames = frame_signal(padded, n_fft, hop_length) * window
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1).T[:, :t]
        return spec / jnp.maximum(jnp.abs(spec), 1e-8)

    def body(_, phase):
        return stft_phase(istft(magnitudes * phase))[:, :t]

    phase = jax.lax.fori_loop(0, n_iters, body, phase)
    return istft(magnitudes * phase)


# ---------------------------------------------------------------------------
# Convenience bundle
# ---------------------------------------------------------------------------

class MelPipeline:
    """Precomputed window + filterbank with config-bound convenience methods.

    TPU analogue of the reference's TacotronSTFT / torchaudio module pair.
    All heavy math is in the jitted free functions above.
    """

    def __init__(self, sampling_rate=22050, n_fft=1024, hop_length=256,
                 win_length=1024, n_mels=80, f_min=0.0, f_max=8000.0):
        self.sampling_rate = sampling_rate
        self.n_fft = n_fft
        self.hop_length = hop_length
        self.win_length = win_length
        self.n_mels = n_mels
        self.window = jnp.asarray(hann_window(win_length))
        self.mel_fb = jnp.asarray(
            melscale_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels, sampling_rate)
        )

    def __call__(self, audio: jnp.ndarray):
        return logmel_and_energy(
            audio, self.window, self.mel_fb,
            self.n_fft, self.hop_length, self.win_length,
        )

    def kurtosis(self, audio: jnp.ndarray, durations: jnp.ndarray, max_chars: int):
        return spectral_kurtosis(
            audio, durations, self.window, max_chars,
            self.n_fft, self.hop_length, self.win_length,
        )
