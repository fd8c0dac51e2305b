"""HiFi-GAN discriminators (MPD + MSD) and GAN losses, in JAX/flax.

BEYOND-REFERENCE extension: the reference repo ships only the HiFi-GAN
*generator* for inference and depends on downloading the published
"universal" checkpoint (reference setup.sh:1-5, scripts/hifigan/models.py
has no discriminators). This module provides what that leaves out — the
ability to TRAIN the vocoder on TPU — following the HiFi-GAN recipe
(Kong et al., 2020, arXiv:2010.05646):

  * Multi-Period Discriminator: 5 sub-discriminators on period-reshaped
    views of the waveform (periods 2/3/5/7/11), Conv2d (5,1) stride (3,1)
    stacks, channels 32->1024.
  * Multi-Scale Discriminator: 3 sub-discriminators on raw / 2x / 4x
    average-pooled audio, grouped Conv1d stacks.
  * LSGAN adversarial losses, feature-matching L1 (x2), mel-spectrogram
    L1 (x45).

All convolutions use trainable weight normalization (w = g * v / ||v||).
The official implementation uses spectral norm on the first MSD scale
only; we use weight norm there too — spectral norm needs power-iteration
state, and LSGAN + weight norm trains stably for this generator (pinned
by tests/test_vocoder_training.py overfit test).

The trained generator parameter pytree is exactly
`models/hifigan.py HiFiGANGenerator`'s, so a trained vocoder plugs into
`vocoder_infer` / `Synthesizer` / the converters' ecosystem unchanged.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1

# torch Conv default init: U(-sqrt(k), sqrt(k)), k = 1 / fan_in
_conv_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class WNConv(nn.Module):
    """Conv with trainable weight normalization, NHWC/NHC feature-last.

    w_eff = g * v / ||v||_per-filter. g is initialized to sqrt(1/3) —
    the expected norm of the kaiming-uniform draw of v — so the effective
    initial weights match a plain torch Conv's scale in expectation.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = None
    padding: Sequence[tuple[int, int]] | str = "SAME"
    feature_group_count: int = 1
    # compute precision: params and the weight-norm math stay f32; the conv
    # runs in `dtype` with f32 accumulation and inter-layer activations
    # travel at `dtype` width (the HBM-bandwidth win; mirrors hifigan.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = tuple(self.kernel_size)
        cin = x.shape[-1] // self.feature_group_count
        v = self.param("v", _conv_init, (*k, cin, self.features))
        g = self.param("g", nn.initializers.constant(float(np.sqrt(1 / 3))),
                       (self.features,))
        norm = jnp.sqrt(jnp.sum(v * v, axis=tuple(range(v.ndim - 1)),
                                keepdims=True) + 1e-12)
        w = (g / norm) * v
        b = self.param("b", nn.initializers.zeros, (self.features,))
        dn = ("NHC", "HIO", "NHC") if len(k) == 1 else ("NHWC", "HWIO", "NHWC")
        # no preferred_element_type: TPU accumulates f32 regardless, and
        # a mixed preferred/operand dtype breaks the conv transpose rule
        # under grad (see models/hifigan.py _conv1d)
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=tuple(self.strides or (1,) * len(k)),
            padding=self.padding, dimension_numbers=dn,
            feature_group_count=self.feature_group_count).astype(self.dtype)
        return out + b.astype(self.dtype)


class PeriodDiscriminator(nn.Module):
    """One MPD sub-discriminator over a (T/p, p) view of the waveform."""

    period: int
    channels: tuple[int, ...] = (32, 128, 512, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T) -> (logits (B, N) f32, feature maps at self.dtype)."""
        b, t = x.shape
        p = self.period
        pad = (-t) % p
        if pad:  # reflect-pad to a period multiple (official F.pad mode)
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
        h = x.reshape(b, -1, p, 1)                       # (B, T/p, p, 1)
        fmaps = []
        for ch in self.channels:
            h = WNConv(ch, (5, 1), strides=(3, 1),
                       padding=((2, 2), (0, 0)), dtype=self.dtype)(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmaps.append(h)
        h = WNConv(self.channels[-1], (5, 1), strides=(1, 1),
                   padding=((2, 2), (0, 0)), dtype=self.dtype)(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmaps.append(h)
        h = WNConv(1, (3, 1), strides=(1, 1), padding=((1, 1), (0, 0)),
                   dtype=self.dtype)(h)
        fmaps.append(h)
        return h.reshape(b, -1).astype(jnp.float32), fmaps


class ScaleDiscriminator(nn.Module):
    """One MSD sub-discriminator: grouped Conv1d stack on raw audio."""

    channels: int = 128  # official: 128 -> ... -> 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T) -> (logits (B, N) f32, feature maps at self.dtype)."""
        b = x.shape[0]
        c = self.channels
        h = x[:, :, None]                                # (B, T, 1)
        layers = [
            dict(ch=c, k=15, s=1, g=1, pad=7),
            dict(ch=c, k=41, s=2, g=4, pad=20),
            dict(ch=2 * c, k=41, s=2, g=16, pad=20),
            dict(ch=4 * c, k=41, s=4, g=16, pad=20),
            dict(ch=8 * c, k=41, s=4, g=16, pad=20),
            dict(ch=8 * c, k=41, s=1, g=16, pad=20),
            dict(ch=8 * c, k=5, s=1, g=1, pad=2),
        ]
        fmaps = []
        for sp in layers:
            # official group counts at c=128; gcd keeps scaled-down test
            # configs valid while preserving them at full size
            g = int(np.gcd(np.gcd(sp["g"], h.shape[-1]), sp["ch"]))
            h = WNConv(sp["ch"], (sp["k"],), strides=(sp["s"],),
                       padding=((sp["pad"], sp["pad"]),),
                       feature_group_count=g, dtype=self.dtype)(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmaps.append(h)
        h = WNConv(1, (3,), strides=(1,), padding=((1, 1),),
                   dtype=self.dtype)(h)
        fmaps.append(h)
        return h.reshape(b, -1).astype(jnp.float32), fmaps


def _avg_pool1d(x: jnp.ndarray, kernel: int = 4, stride: int = 2,
                pad: int = 2) -> jnp.ndarray:
    """torch AvgPool1d(4, 2, padding=2) semantics (count includes pads)."""
    xp = jnp.pad(x, ((0, 0), (pad, pad)))
    n = (xp.shape[1] - kernel) // stride + 1
    idx = jnp.arange(n)[:, None] * stride + jnp.arange(kernel)[None, :]
    return jnp.mean(xp[:, idx], axis=-1)


class MultiPeriodDiscriminator(nn.Module):
    periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    channels: tuple[int, ...] = (32, 128, 512, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        """Scores real and generated audio with shared sub-discriminators.

        Returns (real_logits, gen_logits, real_fmaps, gen_fmaps) lists.
        """
        rs, gs, fr, fg = [], [], [], []
        for p in self.periods:
            d = PeriodDiscriminator(p, self.channels, dtype=self.dtype,
                                    name=f"p{p}")
            lr, mr = d(y)
            lg, mg = d(y_hat)
            rs.append(lr), gs.append(lg), fr.append(mr), fg.append(mg)
        return rs, gs, fr, fg


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3
    channels: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        rs, gs, fr, fg = [], [], [], []
        for s in range(self.n_scales):
            d = ScaleDiscriminator(self.channels, dtype=self.dtype,
                                    name=f"s{s}")
            lr, mr = d(y)
            lg, mg = d(y_hat)
            rs.append(lr), gs.append(lg), fr.append(mr), fg.append(mg)
            if s + 1 < self.n_scales:
                y = _avg_pool1d(y)
                y_hat = _avg_pool1d(y_hat)
        return rs, gs, fr, fg


class ResolutionDiscriminator(nn.Module):
    """One MRD sub-discriminator: 2-D conv stack on an STFT magnitude
    (UnivNet, arXiv:2106.07889; the BigVGAN recipe pairs MPD with three of
    these instead of the MSD). Input layout NHWC with H = freq bins,
    W = frames; kernels (3, 9) span 3 bins x 9 frames, strides (1, 2)
    decimate time."""

    resolution: tuple[int, int, int] = (1024, 120, 600)  # n_fft, hop, win
    channels: int = 32
    dtype: jnp.dtype = jnp.float32

    def _magnitude(self, x: jnp.ndarray) -> jnp.ndarray:
        """Eps-guarded |STFT|: zero-padded training segments have exactly
        zero bins whose |z| gradient is NaN — sqrt(re^2 + im^2 + eps)
        keeps the D/G updates finite (jnp.abs would not)."""
        from visual_onoma_to_wave_tpu.ops.stft import (
            _reflect_pad_1d, frame_signal, hann_window)
        n_fft, hop, win = self.resolution
        window = jnp.asarray(hann_window(win))
        if win < n_fft:
            lpad = (n_fft - win) // 2
            window = jnp.pad(window, (lpad, n_fft - win - lpad))
        frames = frame_signal(_reflect_pad_1d(x.astype(jnp.float32),
                                              n_fft // 2), n_fft, hop)
        spec = jnp.fft.rfft(frames * window, n=n_fft, axis=-1)  # (B, T', F)
        return jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, T) -> (logits (B, N) f32, feature maps at self.dtype)."""
        b = x.shape[0]
        mag = self._magnitude(x)                         # (B, T', F)
        h = mag.swapaxes(1, 2)[..., None]                # (B, F, T', 1)
        fmaps = []
        specs = [dict(s=(1, 1)), dict(s=(1, 2)), dict(s=(1, 2)),
                 dict(s=(1, 2))]
        for sp in specs:
            h = WNConv(self.channels, (3, 9), strides=sp["s"],
                       padding=((1, 1), (4, 4)), dtype=self.dtype)(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmaps.append(h)
        h = WNConv(self.channels, (3, 3), strides=(1, 1),
                   padding=((1, 1), (1, 1)), dtype=self.dtype)(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmaps.append(h)
        h = WNConv(1, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                   dtype=self.dtype)(h)
        fmaps.append(h)
        return h.reshape(b, -1).astype(jnp.float32), fmaps


class MultiResolutionDiscriminator(nn.Module):
    """Drop-in alternative to MultiScaleDiscriminator (same
    (y, y_hat) -> (rs, gs, fr, fg) interface, so
    `VocoderTrainer(msd=MultiResolutionDiscriminator())` swaps it in).
    Default resolutions are the UnivNet/BigVGAN triple."""

    resolutions: tuple[tuple[int, int, int], ...] = (
        (1024, 120, 600), (2048, 240, 1200), (512, 50, 240))
    channels: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        rs, gs, fr, fg = [], [], [], []
        for r in self.resolutions:
            d = ResolutionDiscriminator(tuple(r), self.channels,
                                        dtype=self.dtype,
                                        name=f"r{r[0]}")
            lr, mr = d(y)
            lg, mg = d(y_hat)
            rs.append(lr), gs.append(lg), fr.append(mr), fg.append(mg)
        return rs, gs, fr, fg


# ---------------------------------------------------------------------------
# GAN losses (HiFi-GAN paper eqs. 1-3; LSGAN form)
# ---------------------------------------------------------------------------

def discriminator_loss(real_logits, gen_logits) -> jnp.ndarray:
    """sum_k E[(1 - D_k(y))^2] + E[D_k(y_hat)^2]."""
    loss = 0.0
    for dr, dg in zip(real_logits, gen_logits):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_adversarial_loss(gen_logits) -> jnp.ndarray:
    """sum_k E[(1 - D_k(y_hat))^2]."""
    loss = 0.0
    for dg in gen_logits:
        loss = loss + jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
    return loss


def feature_matching_loss(real_fmaps, gen_fmaps) -> jnp.ndarray:
    """2 * sum over sub-discriminators and layers of L1(fm_r, fm_g)."""
    loss = 0.0
    for mr, mg in zip(real_fmaps, gen_fmaps):
        for r, g in zip(mr, mg):
            loss = loss + jnp.mean(jnp.abs(r.astype(jnp.float32)
                                           - g.astype(jnp.float32)))
    return 2.0 * loss
