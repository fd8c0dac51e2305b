"""BigVGAN-family vocoder: snake activations + anti-aliased resampling
(beyond-reference, TPU-first).

BigVGAN (Lee et al., arXiv:2206.04658) upgrades the HiFi-GAN generator with
two ideas: (a) the periodic **snake** activation x + (1/beta) sin^2(alpha x)
(alpha/beta per-channel, learned in log scale) whose inductive bias matches
audio's oscillatory structure, and (b) **anti-aliased** nonlinearities — the
activation is applied at 2x the local sample rate (Kaiser-windowed-sinc
upsample -> snake -> lowpass + decimate), suppressing the aliasing a
pointwise nonlinearity folds back below Nyquist. The skeleton (transposed
convs + multi-receptive-field residual fusion) is HiFi-GAN's, so this
module reuses the conv helpers and chunked-vocoding machinery of
`models/hifigan.py`.

Fills the same vocoder slot as the other families (reference
`scripts/utils/model.py:41-98`); like iSTFTNet/Vocos it is self-trained via
`cli train-vocoder --family bigvgan` (the reference can only download its
vocoder, `setup.sh:1-5`). The recommended discriminator pairing is
MPD + the multi-resolution spectrogram discriminator
(`models/hifigan_disc.py::MultiResolutionDiscriminator`, from UnivNet,
arXiv:2106.07889), matching the BigVGAN recipe.

TPU notes:
  * snake is pure elementwise VPU work — XLA fuses it into the surrounding
    convs; sin is a native VPU transcendental.
  * the anti-aliasing FIRs are K=12 depthwise convs at 2x the stage rate.
    They dominate the *extra* cost of BigVGAN over HiFi-GAN V1 (every
    activation triples its bandwidth: up, act, down at 2x rate). The
    `anti_aliased` flag exists to measure that cost honestly; quality-first
    deployments keep it on (the paper's ablation: AA is worth ~0.15 MOS).
  * filters are fixed (non-learned) numpy constants baked into the
    executable — no HBM traffic for them.

No published-checkpoint converter: the BigVGAN weights are not among the
reference's artifacts, and this environment has no network; recipe-level
(not bit-level) parity with the paper is the target, pinned by tests.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from visual_onoma_to_wave_tpu.models.hifigan import (
    _conv1d,
    _conv_transpose1d,
)


# ---------------------------------------------------------------------------
# Kaiser-windowed sinc anti-aliasing filters (standard FIR design; see
# Oppenheim & Schafer ch. 7 — same parametrization as the BigVGAN paper's
# alias-free module: K = 12, cutoff 0.5/ratio, transition half-width
# 0.6/ratio, DC gain normalized to 1)
# ---------------------------------------------------------------------------

def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """Lowpass FIR: windowed sinc with the Kaiser beta chosen from the
    required stopband attenuation for this kernel size / transition width.
    cutoff and half_width are in cycles/sample (Nyquist = 0.5)."""
    delta_f = 4.0 * half_width
    a = 2.285 * (kernel_size - 1) * np.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if kernel_size % 2 == 0:
        time = np.arange(-kernel_size // 2, kernel_size // 2) + 0.5
    else:
        time = np.arange(kernel_size) - (kernel_size - 1) / 2
    f = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    f /= f.sum()  # unit DC gain
    return f.astype(np.float32)


def _depthwise(x: jnp.ndarray, h: np.ndarray, *, stride: int = 1,
               lhs_dilation: int = 1, pad: tuple[int, int],
               dtype=jnp.float32) -> jnp.ndarray:
    """Depthwise conv of (B, T, C) with one shared (K,) filter h.

    The filter weight is built in PURE numpy and handed to lax.conv as a
    host constant: any jnp op on a concrete array here (asarray/astype)
    would execute EAGERLY at trace time — ~2 tunnel round-trips per AA
    site, and a BigVGAN forward has ~150 of them, which measured as a
    6-minute trace on the tunneled platform (docs/PERF.md)."""
    c = x.shape[-1]
    w = np.ascontiguousarray(np.broadcast_to(
        h.astype(np.dtype(dtype))[:, None, None], (len(h), 1, c)))
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w, window_strides=(stride,),
        padding=[pad], lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c).astype(dtype)


_AA_KERNEL = 12  # K = int(6 * ratio / 2) * 2 at ratio 2


def upsample2(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, T, C) -> (B, 2T, C): zero-stuff + interpolation FIR (gain 2).

    Edge handling replicates the boundary sample (torch 'replicate'),
    keeping chunked vocoding exact away from true signal edges."""
    h = 2.0 * kaiser_sinc_filter1d(0.25, 0.3, _AA_KERNEL)
    pad = _AA_KERNEL // 2 - 1                       # 5 input samples
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # transposed conv (stride 2, no torch padding) then center-crop to 2T:
    # out = 2*(T+2*pad-1)+K before the crop; the symmetric filter makes the
    # explicit flip a no-op, so lhs-dilated conv == torch conv_transpose
    y = _depthwise(xp, h, lhs_dilation=2,
                   pad=(_AA_KERNEL - 1, _AA_KERNEL - 1), dtype=dtype)
    lo = pad * 2 + (_AA_KERNEL - 2) // 2
    return y[:, lo:lo + 2 * x.shape[1], :]


def downsample2(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(B, 2T, C) -> (B, T, C): lowpass FIR + decimate by 2."""
    h = kaiser_sinc_filter1d(0.25, 0.3, _AA_KERNEL)
    pad_l = _AA_KERNEL // 2 - 1
    pad_r = _AA_KERNEL // 2
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)), mode="edge")
    return _depthwise(xp, h, stride=2, pad=(0, 0), dtype=dtype)


# ---------------------------------------------------------------------------
# Snake activations (alpha/beta learned per channel, log scale)
# ---------------------------------------------------------------------------

def snake(x: jnp.ndarray, log_alpha: jnp.ndarray) -> jnp.ndarray:
    """x + (1/alpha) sin^2(alpha x), alpha = exp(log_alpha) per channel."""
    a = jnp.exp(log_alpha.astype(jnp.float32)).astype(x.dtype)
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


def snake_beta(x: jnp.ndarray, log_alpha: jnp.ndarray,
               log_beta: jnp.ndarray) -> jnp.ndarray:
    """x + (1/beta) sin^2(alpha x): separate frequency (alpha) and
    magnitude (beta) parameters (the BigVGAN default)."""
    a = jnp.exp(log_alpha.astype(jnp.float32)).astype(x.dtype)
    b = jnp.exp(log_beta.astype(jnp.float32)).astype(x.dtype)
    return x + jnp.sin(a * x) ** 2 / (b + 1e-9)


class _SnakeAct(nn.Module):
    """One activation site: per-channel snake/snakebeta params, optionally
    wrapped in the 2x anti-aliasing resample pair."""

    channels: int
    activation: str = "snakebeta"   # "snake" | "snakebeta"
    anti_aliased: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        la = self.param("log_alpha", nn.initializers.zeros, (self.channels,))
        if self.activation == "snakebeta":
            lb = self.param("log_beta", nn.initializers.zeros,
                            (self.channels,))
            act = lambda h: snake_beta(h, la, lb)
        elif self.activation == "snake":
            act = lambda h: snake(h, la)
        else:
            raise ValueError(f"unknown activation {self.activation!r}")
        if not self.anti_aliased:
            return act(x)
        return downsample2(act(upsample2(x, dtype=self.dtype)),
                           dtype=self.dtype)


class AMPBlock1(nn.Module):
    """Anti-aliased multi-periodicity block: HiFi-GAN's ResBlock1 with the
    leaky-ReLUs replaced by (anti-aliased) snake activations."""

    channels: int
    kernel_size: int
    dilations: tuple[int, ...] = (1, 3, 5)
    activation: str = "snakebeta"
    anti_aliased: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dilations):
            w1 = self.param(f"convs1_{i}_w", nn.initializers.normal(0.01),
                            (self.kernel_size, self.channels, self.channels))
            b1 = self.param(f"convs1_{i}_b", nn.initializers.zeros,
                            (self.channels,))
            w2 = self.param(f"convs2_{i}_w", nn.initializers.normal(0.01),
                            (self.kernel_size, self.channels, self.channels))
            b2 = self.param(f"convs2_{i}_b", nn.initializers.zeros,
                            (self.channels,))
            h = _SnakeAct(self.channels, self.activation, self.anti_aliased,
                          dtype=self.dtype, name=f"act1_{i}")(x)
            h = _conv1d(h, w1, b1, dilation=d, dtype=self.dtype)
            h = _SnakeAct(self.channels, self.activation, self.anti_aliased,
                          dtype=self.dtype, name=f"act2_{i}")(h)
            h = _conv1d(h, w2, b2, dilation=1, dtype=self.dtype)
            x = x + h
        return x


# Paper model-size presets. "base" = bigvgan_base_22khz_80band (14 M params,
# same upsample plan as HiFi-GAN V1); "large" = bigvgan_22khz_80band (112 M,
# initial channel 1536 and a 4,4,2,2,2,2 upsample plan).
BIGVGAN_PRESETS = {
    "base": {},
    "large": {
        "upsample_rates": (4, 4, 2, 2, 2, 2),
        "upsample_kernel_sizes": (8, 8, 4, 4, 4, 4),
        "upsample_initial_channel": 1536,
    },
}


class BigVGANGenerator(nn.Module):
    """Mel (B, T, n_mels) -> waveform (B, T * prod(upsample_rates))."""

    upsample_rates: tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    anti_aliased: bool = True
    n_mels: int = 80
    dtype: jnp.dtype = jnp.float32  # compute precision; params stay f32

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates, dtype=np.int64))

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        ch0 = self.upsample_initial_channel
        w = self.param("conv_pre_w", nn.initializers.normal(0.01),
                       (7, self.n_mels, ch0))
        b = self.param("conv_pre_b", nn.initializers.zeros, (ch0,))
        x = _conv1d(mel, w, b, dtype=self.dtype)

        n_kernels = len(self.resblock_kernel_sizes)
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            cin = ch0 // (2 ** i)
            cout = ch0 // (2 ** (i + 1))
            # BigVGAN has NO pre-upsample activation (unlike HiFi-GAN):
            # generator = ups -> AMP fusion per stage
            wt = self.param(f"up_{i}_w", nn.initializers.normal(0.01),
                            (k, cin, cout))
            bt = self.param(f"up_{i}_b", nn.initializers.zeros, (cout,))
            x = _conv_transpose1d(x, wt, bt, stride=u,
                                  torch_padding=(k - u) // 2,
                                  dtype=self.dtype)
            acc = None
            for j, (rk, rd) in enumerate(zip(self.resblock_kernel_sizes,
                                             self.resblock_dilations)):
                y = AMPBlock1(cout, rk, tuple(rd),
                              activation=self.activation,
                              anti_aliased=self.anti_aliased,
                              dtype=self.dtype, name=f"amp_{i}_{j}")(x)
                acc = y if acc is None else acc + y
            x = acc / n_kernels

        ch_last = ch0 // (2 ** len(self.upsample_rates))
        x = _SnakeAct(ch_last, self.activation, self.anti_aliased,
                      dtype=self.dtype, name="act_post")(x)
        w = self.param("conv_post_w", nn.initializers.normal(0.01),
                       (7, ch_last, 1))
        b = self.param("conv_post_b", nn.initializers.zeros, (1,))
        x = _conv1d(x.astype(jnp.float32), w, b)  # final conv in f32
        return jnp.tanh(x)[..., 0]

    def receptive_halo_frames(self) -> int:
        """One-sided receptive field in INPUT mel frames (for sample-exact
        chunked vocoding via hifigan.vocoder_infer_chunked).

        Same derivation as hifigan.receptive_halo_frames plus the
        anti-aliasing FIRs: each AA activation adds one up-filter and one
        down-filter half-span; at the activation's own rate that is
        <= 2 * (K/2 + pad) = 2 * K - 2 samples, counted generously (a halo
        may only over-cover, never under-cover)."""
        aa = (2 * _AA_KERNEL - 2) if self.anti_aliased else 0
        halo = (7 - 1) // 2 + aa  # conv_post + post activation, output rate
        for u, k, in zip(reversed(self.upsample_rates),
                         reversed(self.upsample_kernel_sizes)):
            mrf = max(
                sum((d + 1) * (rk - 1) // 2 + 2 * aa for d in rd)
                for rk, rd in zip(self.resblock_kernel_sizes,
                                  self.resblock_dilations))
            halo += mrf
            pad = (k - u) // 2
            halo = -(-(halo + k - 1 - pad) // u)
        return halo + (7 - 1) // 2
