"""iSTFT-head vocoder family (beyond-reference, TPU-first).

Motivation: the reference HiFi-GAN V1 (scripts/hifigan/models.py:112-165,
upsample rates 8,8,2,2 per scripts/hifigan/config.json:11-15) spends 46%
of its device time in the C=64/32 upsample+MRF tail, which is structurally
MXU-starved — output channels fill only 64/128 or 32/128 MXU lanes
(measured dead end, docs/PERF.md "small-channel wall"). iSTFTNet
(Kaneko et al., ICASSP 2022, arXiv:2203.02395) removes that tail
architecturally: the learned network stops while channels are still wide
and emits the magnitude and phase of a short-window STFT; a deterministic
inverse STFT supplies the remaining upsampling. The "mel-rate" preset
pushes the idea to its limit (the layout popularized by Vocos,
arXiv:2306.00814): no learned upsampling at all — every conv runs at mel
rate with 512 channels, and a full n_fft=1024 / hop=256 iSTFT produces the
waveform.

TPU-first formulation: the entire iSTFT — irfft, synthesis window,
overlap-add — is one dense matmul against a fixed window-scaled
inverse-DFT basis followed by a 4-way shifted block add (win = 4*hop
always), so the head is pure MXU work and XLA fuses the exp/cos/sin head
math into it. The overlap-add normalizer (window sum-square) is a
host-precomputed constant. (A stride=hop transposed-conv formulation of
the same math measured 83x slower at the melrate shape — see
istft_overlap_add.)

The learned trunk reuses the HiFi-GAN building blocks (`ResBlock1`,
`_conv1d`, `_conv_transpose1d` from models/hifigan.py), so discriminators,
GAN losses and the vocoder trainer apply unchanged — only the
upsample-factor bookkeeping generalizes (``total_upsample``).
"""
from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from visual_onoma_to_wave_tpu.models.hifigan import (
    LRELU_SLOPE,
    ResBlock1,
    _conv1d,
    _conv_transpose1d,
)
from visual_onoma_to_wave_tpu.ops.stft import hann_window

# Magnitude cap: mag = exp(min(logmag, ln(100))). Unconstrained exp can
# overflow bf16 grads early in GAN training; 100 is ~40 dB above full scale.
_MAX_MAG = 100.0

# Named architecture presets (all keep total upsampling = 256 = hop_length).
ISTFT_PRESETS: dict[str, dict] = {
    # iSTFTNet C8C8I (arXiv:2203.02395 Table 1): two x8 stages, 16-pt iSTFT
    "c8c8i": dict(upsample_rates=(8, 8), upsample_kernel_sizes=(16, 16),
                  istft_n_fft=16),
    # mel-rate: no learned upsampling, full-resolution 1024-pt iSTFT head
    "melrate": dict(upsample_rates=(), upsample_kernel_sizes=(),
                    istft_n_fft=1024),
}


@functools.lru_cache(maxsize=None)
def istft_synthesis_kernel(n_fft: int) -> np.ndarray:
    """The fixed synthesis basis implementing irfft+window.

    Returns (2*n_bins, n_fft) f32 in matmul orientation (spectra @ basis
    -> windowed time frames). Input rows are
    [Re(X_0)..Re(X_nb-1), Im(X_0)..Im(X_nb-1)]; output position t within a
    frame receives  w[t] * irfft(X)[t]  where
      irfft(X)[t] = (1/N) * sum_k scale_k * (Re X_k cos(2 pi k t / N)
                                             - Im X_k sin(2 pi k t / N)),
    scale_k = 1 for DC/Nyquist, 2 otherwise (Hermitian symmetry).
    """
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_bins, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, t) / n_fft          # (n_bins, n_fft)
    scale = np.full((n_bins, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    w = hann_window(n_fft).astype(np.float64)[None, :]  # (1, n_fft)
    kernel = np.concatenate([scale * np.cos(ang) * w,
                             -scale * np.sin(ang) * w], axis=0)
    return kernel.astype(np.float32)                    # (2nb, n_fft)


@functools.lru_cache(maxsize=None)
def _wss_trimmed(n_frames: int, n_fft: int) -> np.ndarray:
    """Window sum-square normalizer for the trimmed OLA output (host-side
    constant — it depends only on the static (n_frames, n_fft))."""
    hop = n_fft // 4
    w2 = hann_window(n_fft).astype(np.float64) ** 2
    full = np.zeros((n_frames - 1) * hop + n_fft)
    for i in range(n_frames):
        full[i * hop: i * hop + n_fft] += w2
    trim = (n_fft - hop) // 2
    return np.maximum(full[trim: trim + n_frames * hop],
                      1e-8).astype(np.float32)


def istft_overlap_add(frames_ri: jnp.ndarray, n_fft: int,
                      precision=None) -> jnp.ndarray:
    """Windowed inverse STFT with hop = n_fft//4: dense synthesis matmul +
    4-way shifted block add.

    frames_ri: (B, N, 2*n_bins) real/imag interleaved-by-half spectra.
    Returns (B, N*hop) float32 (window sum-square normalized; the
    (n_fft-hop)//2 edge trim makes output length exactly N*hop).

    Formulation note: expressing the OLA as a stride=hop transposed conv
    measured 829 ms for the melrate head (B=128, T=512) — XLA's
    lhs-dilated conv path collapses at stride 256 / kernel 1024. The
    frames @ basis matmul + shift-add below measures 10 ms for the same
    work (v5e, docs/PERF.md). Since win = 4*hop, output position
    m = (n+q)*hop + r receives sub-block q of frame n: four padded adds.
    Precision.HIGHEST on the basis matmul keeps the head f32-exact
    (default TPU matmul precision is bf16-pass, ~1e-3 relative — audible
    floor on waveform samples). `precision` overrides it: HIGH (bf16x3)
    measures 1.4e-5 rel vs float64 (-97 dB, below the 16-bit quantization
    floor) and ~2 ms faster at the B=128xT=512 serving shape
    (docs/PERF.md) — a legal serving knob; HIGHEST stays the default for
    the exactness guarantee the tests pin.
    """
    hop = n_fft // 4
    b, n, _ = frames_ri.shape
    basis = jnp.asarray(istft_synthesis_kernel(n_fft))
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    y = jnp.matmul(frames_ri.astype(jnp.float32), basis,
                   precision=precision)                    # (B, N, n_fft)
    y = y.reshape(b, n, 4, hop)
    full = sum(jnp.pad(y[:, :, q, :], ((0, 0), (q, 3 - q), (0, 0)))
               for q in range(4)).reshape(b, (n + 3) * hop)
    trim = (n_fft - hop) // 2
    core = full[:, trim: trim + n * hop]
    return core / jnp.asarray(_wss_trimmed(n, n_fft))


class ISTFTNetGenerator(nn.Module):
    """Mel (B, T, n_mels) -> waveform (B, T*256) via a learned trunk plus a
    fixed iSTFT head. With the default C8C8I preset the trunk upsamples
    64x (channels 512->256->128) and the head's 16-pt/hop-4 iSTFT supplies
    the final 4x; the mel-rate preset has no trunk upsampling and a
    1024-pt/hop-256 head."""

    upsample_rates: tuple[int, ...] = (8, 8)
    upsample_kernel_sizes: tuple[int, ...] = (16, 16)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = ((1, 3, 5),) * 3
    n_mels: int = 80
    istft_n_fft: int = 16
    post_kernel_size: int = 7
    dtype: jnp.dtype = jnp.float32  # trunk compute precision; head is f32

    @property
    def istft_hop(self) -> int:
        return self.istft_n_fft // 4

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates, dtype=np.int64)) * self.istft_hop

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        ch0 = self.upsample_initial_channel
        w = self.param("conv_pre_w", nn.initializers.normal(0.01),
                       (7, self.n_mels, ch0))
        b = self.param("conv_pre_b", nn.initializers.zeros, (ch0,))
        x = _conv1d(mel, w, b, dtype=self.dtype)

        n_kernels = len(self.resblock_kernel_sizes)
        ch = ch0
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            cin, ch = ch, ch // 2
            x = nn.leaky_relu(x, LRELU_SLOPE)
            wt = self.param(f"up_{i}_w", nn.initializers.normal(0.01),
                            (k, cin, ch))
            bt = self.param(f"up_{i}_b", nn.initializers.zeros, (ch,))
            x = _conv_transpose1d(x, wt, bt, stride=u,
                                  torch_padding=(k - u) // 2, dtype=self.dtype)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                y = ResBlock1(ch, rk, tuple(rd), dtype=self.dtype,
                              name=f"resblock_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / n_kernels
        if not self.upsample_rates:
            # mel-rate preset: the MRF still runs, just without upsampling
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                y = ResBlock1(ch, rk, tuple(rd), dtype=self.dtype,
                              name=f"resblock_0_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / n_kernels

        n_bins = self.istft_n_fft // 2 + 1
        x = nn.leaky_relu(x, 0.01)  # torch F.leaky_relu default, as HiFi-GAN
        w = self.param("conv_post_w", nn.initializers.normal(0.01),
                       (self.post_kernel_size, ch, 2 * n_bins))
        b = self.param("conv_post_b", nn.initializers.zeros, (2 * n_bins,))
        spec = _conv1d(x.astype(jnp.float32), w, b)      # head math in f32
        logmag, phase = spec[..., :n_bins], spec[..., n_bins:]
        mag = jnp.exp(jnp.minimum(logmag, math.log(_MAX_MAG)))
        frames_ri = jnp.concatenate(
            [mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
        return istft_overlap_add(frames_ri, self.istft_n_fft)

    def receptive_halo_frames(self) -> int:
        """One-sided receptive field in INPUT mel frames (for sample-exact
        chunked vocoding; see hifigan.receptive_halo_frames)."""
        hop = self.istft_hop
        # a trunk frame n influences output samples within the istft conv's
        # span; inverting: output sample m depends on frames within
        # ceil((n_fft-1-pad)/hop) of m//hop. Also ensure the chunk core is
        # >= n_fft-hop samples from the chunk edge so the per-chunk window
        # sum-square equals the full signal's there.
        pad = (self.istft_n_fft - hop) // 2
        halo = max(-(-(self.istft_n_fft - 1 - pad) // hop),
                   -(-(self.istft_n_fft - hop) // hop))
        halo += (self.post_kernel_size - 1) // 2
        mrf = max(sum((d + 1) * (rk - 1) // 2 for d in rd)
                  for rk, rd in zip(self.resblock_kernel_sizes,
                                    self.resblock_dilations))
        if not self.upsample_rates:
            halo += mrf
        for u, k in zip(reversed(self.upsample_rates),
                        reversed(self.upsample_kernel_sizes)):
            halo += mrf
            p = (k - u) // 2
            halo = -(-(halo + k - 1 - p) // u)
        return halo + 3  # conv_pre k=7


def build_istftnet(preset: str = "c8c8i", *, dtype=jnp.float32,
                   **overrides) -> ISTFTNetGenerator:
    """Construct an ISTFTNetGenerator from a named preset + overrides."""
    kw = dict(ISTFT_PRESETS[preset.lower()])
    kw.update(overrides)
    return ISTFTNetGenerator(dtype=dtype, **kw)
