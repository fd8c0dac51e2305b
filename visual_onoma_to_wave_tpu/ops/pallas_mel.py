"""Pallas TPU kernel: fused mel-spectrogram frontend.

One VMEM pass per tile of frames computes what the reference's preprocessing
DSP chain (torchaudio Spectrogram -> MelScale -> log/clamp -> L2 energy;
reference scripts/preprocessor/preprocessor.py:22-36, 323-337) does in four
separate passes over HBM-resident intermediates:

    framing -> Hann window -> DFT -> |.| -> mel projection -> log    (logmel)
                                  \\-> sum |.|^2 -> sqrt              (energy)

TPU-first design decisions:
  * The rFFT is expressed as two matmuls against a precomputed (n_fft, F)
    cos/sin basis with the Hann window folded in — it rides the MXU instead
    of a scalar FFT, and fuses with the mel filterbank matmul that follows.
  * Framing exploits n_fft % hop == 0: the padded signal is viewed as
    (n_rows, hop) rows and the host stacks n_fft//hop shifted row views;
    a frame tile is then the lane-concatenation of statically-aligned
    blocks — no gather, no overlapping-window DMA, and the n_fft-wide
    frame tensor never exists in HBM.
  * The frequency axis is zero-padded to a lane multiple (640 for
    n_fft=1024 -> 513 bins) and the mel axis to 128; padding columns are
    exactly zero in the basis so magnitude/energy are unaffected.
  * Per grid step: one batch item x TILE_T frames; the audio tile
    (taps x TILE_T x hop = 512 KB) plus the 5.2 MB basis live in VMEM,
    so clips of any length stream through.

The jnp reference implementation lives in ops/stft.py (logmel_and_energy);
a golden test checks parity between the two.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from visual_onoma_to_wave_tpu.ops.stft import (
    KURTOSIS_EPS,
    char_stats_from_frame_sums,
    hann_window,
    melscale_fbanks,
)

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed DFT basis (n_fft, F_pad) for cos and -sin, float32.

    `rfft(w * x)[f] = sum_n w[n] x[n] (cos - i sin)(2 pi f n / N)`, so
    |rfft|^2 = (x @ Cw)^2 + (x @ Sw)^2 with the window folded into the basis.
    Columns beyond n_fft//2+1 are zero.
    """
    n_freqs = n_fft // 2 + 1
    f_pad = _round_up(n_freqs, LANE)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * f * n / n_fft
    w = hann_window(win_length).astype(np.float64)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    cw = np.zeros((n_fft, f_pad), np.float32)
    sw = np.zeros((n_fft, f_pad), np.float32)
    cw[:, :n_freqs] = (w[:, None] * np.cos(ang)).astype(np.float32)
    sw[:, :n_freqs] = (w[:, None] * np.sin(ang)).astype(np.float32)
    return cw, sw


@functools.lru_cache(maxsize=8)
def _mel_fb_padded(n_fft: int, f_min: float, f_max: float, n_mels: int,
                   sampling_rate: int) -> np.ndarray:
    n_freqs = n_fft // 2 + 1
    fb = melscale_fbanks(n_freqs, f_min, f_max, n_mels, sampling_rate)
    out = np.zeros((_round_up(n_freqs, LANE), _round_up(n_mels, LANE)),
                   np.float32)
    out[:n_freqs, :n_mels] = fb
    return out


def _mel_kernel(audio_ref, cw_ref, sw_ref, fb_ref, out_ref,
                *, tile_t: int, taps: int, hop: int, energy_col: int,
                pad_logeps: float):
    # audio_ref block: (1, taps, tile_t, hop) — tap j holds the rows view
    # shifted by j, so frame t = concat_j rows[t + j] needs only static,
    # sublane-aligned loads (Mosaic cannot prove base+j % 8 == 0 otherwise).
    frames = jnp.concatenate(
        [audio_ref[0, j] for j in range(taps)], axis=1,
    )                                                     # (tile_t, n_fft)
    # HIGHEST: full-f32 MXU passes — the log() at the end amplifies the
    # default bf16x3 error well past the 1e-3 mel-MAE budget (BASELINE.md)
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(frames, cw_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    im = jnp.dot(frames, sw_ref[:], preferred_element_type=jnp.float32,
                 precision=hi)
    power = re * re + im * im                             # (tile_t, F_pad)
    mag = jnp.sqrt(power)
    mel = jnp.dot(mag, fb_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    out = jnp.log(jnp.maximum(mel, 1.0e-5))
    # per-frame stats ride in spare padded mel columns (TPU pallas wants
    # >=2D lane-tiled outputs, so a separate (B, T) output is not expressible
    # for small B — see grid_blockspec docs):
    #   energy_col     L2 energy over freq
    #   energy_col + 1 sum of power over freq          (kurtosis moment 1)
    #   energy_col + 2 sum of log(power + eps), with the constant log(eps)
    #                  contribution of the F_pad-n_freqs zero pad columns
    #                  removed                          (kurtosis log-moment)
    p_sum = jnp.sum(power, axis=1, keepdims=True)             # (tile_t, 1)
    energy = jnp.sqrt(p_sum)
    logp_sum = (jnp.sum(jnp.log(power + KURTOSIS_EPS), axis=1, keepdims=True)
                - pad_logeps)
    col = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    out = jnp.where(col == energy_col, energy, out)
    out = jnp.where(col == energy_col + 1, p_sum, out)
    out_ref[0] = jnp.where(col == energy_col + 2, logp_sum, out)



def _run_mel_kernel(prepadded_audio, n_fft, hop_length, win_length, n_mels,
                    sampling_rate, f_min, f_max, tile_t, interpret):
    """Shared launch path: returns (out (B, t_pad, m_pad), n_frames).

    Column layout of `out`: [0, n_mels) log-mel; n_mels frame L2 energy;
    n_mels+1 power sum over freq; n_mels+2 log-power sum over freq.
    """
    if n_fft % hop_length != 0:
        raise ValueError("pallas mel frontend requires n_fft % hop == 0")
    taps = n_fft // hop_length
    b, length = prepadded_audio.shape
    n_frames = (length - n_fft) // hop_length + 1
    t_pad = _round_up(n_frames, tile_t)
    n_rows = t_pad + taps - 1
    audio = jnp.clip(prepadded_audio, -1.0, 1.0)
    need = n_rows * hop_length
    # `length` may exceed `need` when n_frames lands exactly on a tile_t
    # multiple but the input isn't frame-aligned — pad only when short,
    # always slice to the kernel's row grid
    audio = jnp.pad(audio, ((0, 0), (0, max(0, need - length))))[:, :need]
    rows = audio.reshape(b, n_rows, hop_length)
    # (b, taps, t_pad, hop): tap j = rows shifted by j (see _mel_kernel)
    rows = jnp.stack([rows[:, j:j + t_pad] for j in range(taps)], axis=1)

    cw, sw = _dft_basis(n_fft, win_length)
    fb = _mel_fb_padded(n_fft, f_min, f_max, n_mels, sampling_rate)
    f_pad, m_pad = fb.shape
    if n_mels + 3 > m_pad:
        raise ValueError("need 3 spare padded mel columns for frame stats")
    n_freqs = n_fft // 2 + 1
    pad_logeps = float((f_pad - n_freqs) * np.log(KURTOSIS_EPS))

    out = pl.pallas_call(
        functools.partial(_mel_kernel, tile_t=tile_t, taps=taps,
                          hop=hop_length, energy_col=n_mels,
                          pad_logeps=pad_logeps),
        grid=(b, t_pad // tile_t),
        in_specs=[
            pl.BlockSpec((1, taps, tile_t, hop_length),
                         lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_t, m_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(rows, jnp.asarray(cw), jnp.asarray(sw), jnp.asarray(fb))
    return out, n_frames


@functools.partial(
    jax.jit,
    static_argnames=("n_fft", "hop_length", "win_length", "n_mels",
                     "sampling_rate", "f_min", "f_max", "tile_t", "interpret"),
)
def pallas_logmel_energy(
    prepadded_audio: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    sampling_rate: int = 22050,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    tile_t: int = 128,
    interpret: bool = False,
):
    """Fused log-mel + frame energy for a batch of clips.

    prepadded_audio: (B, L) float32, already reflect-padded by n_fft//2 on
        both sides (torch center=True semantics) — same contract as
        ops.stft.clip_features.
    Returns (logmel (B, n_mels, T), energy (B, T)) with
        T = (L - n_fft)//hop + 1, matching ops.stft.logmel_and_energy.
    """
    out, n_frames = _run_mel_kernel(
        prepadded_audio, n_fft, hop_length, win_length, n_mels,
        sampling_rate, f_min, f_max, tile_t, interpret)
    logmel = out[:, :n_frames, :n_mels].swapaxes(-1, -2)  # (B, M, T)
    return logmel, out[:, :n_frames, n_mels]


@functools.partial(
    jax.jit,
    static_argnames=("max_chars", "n_fft", "hop_length", "win_length",
                     "n_mels", "sampling_rate", "f_min", "f_max", "tile_t",
                     "interpret"),
)
def pallas_clip_features(
    prepadded_audio: jnp.ndarray,
    durations: jnp.ndarray,
    max_chars: int,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    sampling_rate: int = 22050,
    f_min: float = 0.0,
    f_max: float = 8000.0,
    tile_t: int = 128,
    interpret: bool = False,
):
    """Drop-in Pallas-backed equivalent of ops.stft.clip_features.

    The kernel's spare columns carry the per-frame reductions (L2 energy,
    power sum, log-power sum), so char-level energy and spectral kurtosis
    are computed from (B, T)-sized data — the (F, T) spectrogram never
    touches HBM.

    prepadded_audio: (B, L) reflect-padded clips; durations: (B, max_chars).
    Returns (logmel (B, M, T), char_energy (B, max_chars), kurtosis).
    """
    out, n_frames = _run_mel_kernel(
        prepadded_audio, n_fft, hop_length, win_length, n_mels,
        sampling_rate, f_min, f_max, tile_t, interpret)
    n_freqs = n_fft // 2 + 1
    logmel = out[:, :n_frames, :n_mels].swapaxes(-1, -2)      # (B, M, T)
    frame_e = out[:, :n_frames, n_mels]
    p_sum = out[:, :n_frames, n_mels + 1]
    logp_sum = out[:, :n_frames, n_mels + 2]
    char_energy, kurt = jax.vmap(
        functools.partial(char_stats_from_frame_sums,
                          max_chars=max_chars, n_freqs=n_freqs)
    )(frame_e, p_sum, logp_sum, durations)
    return logmel, char_energy, kurt
