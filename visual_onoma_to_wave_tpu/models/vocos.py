"""Vocos-family vocoder: ConvNeXt trunk at mel rate + iSTFT head
(beyond-reference, TPU-first).

Vocos (Siuzdak, arXiv:2306.00814) removes ALL learned upsampling from the
GAN vocoder: every layer runs at mel frame rate, and a full-resolution
n_fft=1024 / hop=256 inverse STFT produces the waveform. Where our
iSTFTNet "melrate" preset (models/istftnet.py) keeps HiFi-GAN's dilated
MRF residual blocks, Vocos swaps the trunk for a ConvNeXt stack: each
block is a k=7 depthwise conv followed by a pointwise Linear
dim -> 3*dim -> GELU -> Linear 3*dim -> dim with LayerNorm and a learned
per-channel residual scale.

Why this is the best TPU mapping of the vocoder problem in this repo:
  * The FLOPs concentrate in the two pointwise matmuls (512 -> 1536 ->
    512 at T=mel rate) — dense, feature-last, both dims >= 128: perfect
    MXU tiles, no transposed convs, none of the C=64/32 small-channel
    stages that structurally starve the MXU in HiFi-GAN's tail
    (docs/PERF.md "small-channel wall").
  * The k=7 depthwise conv is the only VPU-bound op and carries ~0.5% of
    the FLOPs; XLA fuses the GELU/LayerNorm/residual chain into the
    matmuls.
  * The head reuses istftnet.istft_overlap_add — the whole iSTFT is one
    dense basis matmul (Precision.HIGHEST) + 4-way shifted add, measured
    83x faster than the stride-256 transposed-conv formulation.

Like the iSTFT-head families this is self-trained (no published torch
checkpoint is converted), so the GAN machinery in
training/vocoder_trainer.py + models/hifigan_disc.py applies unchanged:
the module only needs `total_upsample` (== hop_length) and
`receptive_halo_frames` (sample-exact chunked vocoding,
hifigan.vocoder_infer_chunked). Reference anchor for the vocoder slot it
fills: scripts/utils/model.py:41-98 (get_vocoder/vocoder_infer) and
scripts/hifigan/models.py:112-165.

Architecture constants follow the published mel-Vocos config (dim 512,
intermediate 1536, 8 blocks, LayerNorm eps 1e-6, layer-scale init
1/num_layers, trunc-normal 0.02 init); they are flax fields so
`vocoder_kwargs` / demo-size overrides work like every other family.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.models.istftnet import (
    _MAX_MAG,
    istft_overlap_add,
)


def _depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      dtype=jnp.float32) -> jnp.ndarray:
    """Depthwise 1-D conv, feature-last. x: (B, T, C); w: (K, 1, C);
    SAME-style padding (k-1)//2. One multiply per tap per channel — VPU
    work, negligible next to the block's pointwise matmuls."""
    k = w.shape[0]
    pad = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), window_strides=(1,),
        padding=[(pad, pad)], dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=x.shape[-1],
    ).astype(dtype)
    return out + b.astype(dtype)


def _layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-6) -> jnp.ndarray:
    """Channel LayerNorm in f32 (bf16 mean/var loses ~2 digits), output in
    x's dtype. eps 1e-6 matches the published Vocos (torch nn.LayerNorm
    default); this family has no torch-checkpoint converter, so the repo's
    eps-1e-5 parity convention (CLAUDE.md) does not bind it."""
    h = x.astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
    h = (h - mu) * jax.lax.rsqrt(var + eps)
    return (h * scale + bias).astype(x.dtype)


class ConvNeXtBlock(nn.Module):
    """depthwise k=7 -> LN -> Linear dim->mid -> GELU -> Linear mid->dim
    -> gamma * -> +x (Liu et al. arXiv:2201.03545, as used by Vocos)."""

    dim: int
    intermediate_dim: int
    layer_scale_init: float
    kernel_size: int = 7
    gelu_approximate: bool = True
    fused_kernel: bool = False  # serve the whole block as one Pallas TPU
    #   kernel (ops/pallas_convnext.py) — inference-only (no VJP), TPU-only
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.truncated_normal(0.02)
        dw = self.param("dwconv_w", init, (self.kernel_size, 1, self.dim))
        db = self.param("dwconv_b", nn.initializers.zeros, (self.dim,))
        ls = self.param("norm_scale", nn.initializers.ones, (self.dim,))
        lb = self.param("norm_bias", nn.initializers.zeros, (self.dim,))
        w1 = self.param("pw1_w", init, (self.dim, self.intermediate_dim))
        b1 = self.param("pw1_b", nn.initializers.zeros,
                        (self.intermediate_dim,))
        w2 = self.param("pw2_w", init, (self.intermediate_dim, self.dim))
        b2 = self.param("pw2_b", nn.initializers.zeros, (self.dim,))
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init),
            (self.dim,))

        if self.fused_kernel:
            if not self.gelu_approximate:
                raise ValueError(
                    "fused_kernel implements the tanh GELU only "
                    "(set gelu_approximate=True)")
            from visual_onoma_to_wave_tpu.ops.pallas_convnext import (
                convnext_block)
            return convnext_block(x.astype(self.dtype), dw, db, ls, lb,
                                  w1, b1, w2, b2, gamma)

        h = _depthwise_conv1d(x, dw, db, dtype=self.dtype)
        h = _layer_norm(h, ls, lb)
        h = h.astype(self.dtype) @ w1.astype(self.dtype) + b1.astype(self.dtype)
        h = nn.gelu(h, approximate=self.gelu_approximate)
        h = h @ w2.astype(self.dtype) + b2.astype(self.dtype)
        return x + gamma.astype(self.dtype) * h


class VocosGenerator(nn.Module):
    """Mel (B, T, n_mels) -> waveform (B, T*256): k=7 embed conv, LN,
    `num_layers` ConvNeXt blocks, final LN, Linear -> (logmag, phase),
    fixed n_fft=1024 / hop=256 iSTFT head. Everything before the head runs
    at mel rate with `dim` channels."""

    n_mels: int = 80
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    embed_kernel_size: int = 7
    istft_n_fft: int = 1024
    gelu_approximate: bool = True  # tanh GELU; the published Vocos uses
    #   exact erf, but this family is self-trained (no checkpoint parity to
    #   keep) and the erf form measures 1.27x slower on v5e (37.7 vs
    #   29.7 ms at the serving shape — docs/PERF.md); quality at matched
    #   budget is unchanged. Set False for the published form.
    fused_kernel: bool = False  # run each ConvNeXt block as one fused
    #   Pallas TPU kernel (ops/pallas_convnext.py): inference-only,
    #   TPU-only, needs T%16==0 and dim/intermediate_dim%128==0
    head_precision: str | None = None  # iSTFT basis matmul precision:
    #   None = HIGHEST (f32-exact, the tested default); "high" = bf16x3,
    #   1.4e-5 rel (-97 dB, below the 16-bit floor) and ~2 ms faster at
    #   the serving shape (docs/PERF.md) — JSON-configurable via
    #   model.vocoder_kwargs
    dtype: jnp.dtype = jnp.float32  # trunk compute precision; head is f32

    @property
    def istft_hop(self) -> int:
        return self.istft_n_fft // 4

    @property
    def total_upsample(self) -> int:
        return self.istft_hop

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.truncated_normal(0.02)
        we = self.param("embed_w", init,
                        (self.embed_kernel_size, self.n_mels, self.dim))
        be = self.param("embed_b", nn.initializers.zeros, (self.dim,))
        pad = (self.embed_kernel_size - 1) // 2
        x = jax.lax.conv_general_dilated(
            mel.astype(self.dtype), we.astype(self.dtype),
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NHC", "HIO", "NHC")).astype(self.dtype)
        x = x + be.astype(self.dtype)
        s0 = self.param("norm_in_scale", nn.initializers.ones, (self.dim,))
        b0 = self.param("norm_in_bias", nn.initializers.zeros, (self.dim,))
        x = _layer_norm(x, s0, b0)

        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                self.dim, self.intermediate_dim,
                layer_scale_init=1.0 / self.num_layers,
                gelu_approximate=self.gelu_approximate,
                fused_kernel=self.fused_kernel,
                dtype=self.dtype, name=f"block_{i}")(x)

        sf = self.param("norm_out_scale", nn.initializers.ones, (self.dim,))
        bf = self.param("norm_out_bias", nn.initializers.zeros, (self.dim,))
        x = _layer_norm(x, sf, bf)

        n_bins = self.istft_n_fft // 2 + 1
        wh = self.param("head_w", init, (self.dim, 2 * n_bins))
        bh = self.param("head_b", nn.initializers.zeros, (2 * n_bins,))
        spec = x.astype(jnp.float32) @ wh + bh        # head math in f32
        logmag, phase = spec[..., :n_bins], spec[..., n_bins:]
        mag = jnp.exp(jnp.minimum(logmag, math.log(_MAX_MAG)))
        frames_ri = jnp.concatenate(
            [mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
        precision = (None if self.head_precision is None
                     else jax.lax.Precision[self.head_precision.upper()])
        return istft_overlap_add(frames_ri, self.istft_n_fft,
                                 precision=precision)

    def receptive_halo_frames(self) -> int:
        """One-sided receptive field in input mel frames (sample-exact
        chunked vocoding, hifigan.vocoder_infer_chunked). Everything runs
        at mel rate, so it is just the sum of conv half-widths plus the
        iSTFT head's frame span (istftnet.ISTFTNetGenerator's derivation
        with no upsample stages)."""
        hop = self.istft_hop
        head_pad = (self.istft_n_fft - hop) // 2
        halo = max(-(-(self.istft_n_fft - 1 - head_pad) // hop),
                   -(-(self.istft_n_fft - hop) // hop))
        halo += (self.embed_kernel_size - 1) // 2
        halo += self.num_layers * 3  # depthwise k=7 per block
        return halo

def apply_fused(gen: VocosGenerator, variables, mel: jnp.ndarray,
                head_precision=None, interpret: bool = False) -> jnp.ndarray:
    """Inference-only forward equivalent to `gen.apply(variables, mel)`
    with the WHOLE ConvNeXt trunk as one Pallas kernel
    (ops/pallas_convnext.py::convnext_trunk): the activation stays
    VMEM-resident across all blocks and the pointwise weights stream from
    HBM one block ahead. MEASURED NEGATIVE at the serving shape (26.6 ms
    vs 25.5 for the per-block kernel, docs/PERF.md): at B=128 the
    re-streamed weights total 3.2 GB of HBM traffic vs the per-block
    design's 1.07 GB of activation round-trips — weights-resident wins
    whenever B x activation < L x weights. Kept as the measured design
    point; serve with VocosGenerator(fused_kernel=True,
    head_precision="high") instead. TPU-only (interpret=True for CPU
    tests); no VJP — training uses gen.apply. head_precision forwards to
    istft_overlap_add (None = HIGHEST; HIGH is the measured-inaudible
    fast knob)."""
    from visual_onoma_to_wave_tpu.ops.pallas_convnext import convnext_trunk

    if not gen.gelu_approximate:
        raise ValueError("apply_fused implements the tanh GELU only "
                         "(set gelu_approximate=True)")
    P = variables["params"]
    dt = gen.dtype
    pad = (gen.embed_kernel_size - 1) // 2
    x = jax.lax.conv_general_dilated(
        mel.astype(dt), P["embed_w"].astype(dt), window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC")).astype(dt)
    x = x + P["embed_b"].astype(dt)
    x = _layer_norm(x, P["norm_in_scale"], P["norm_in_bias"])

    L = gen.num_layers
    stack = lambda k: jnp.stack([P[f"block_{i}"][k] for i in range(L)])
    x = convnext_trunk(
        x.astype(dt), stack("dwconv_w"), stack("dwconv_b"),
        stack("norm_scale"), stack("norm_bias"), stack("pw1_w"),
        stack("pw1_b"), stack("pw2_w"), stack("pw2_b"), stack("gamma"),
        interpret=interpret)

    x = _layer_norm(x, P["norm_out_scale"], P["norm_out_bias"])
    n_bins = gen.istft_n_fft // 2 + 1
    spec = x.astype(jnp.float32) @ P["head_w"] + P["head_b"]
    logmag, phase = spec[..., :n_bins], spec[..., n_bins:]
    mag = jnp.exp(jnp.minimum(logmag, math.log(_MAX_MAG)))
    frames_ri = jnp.concatenate(
        [mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1)
    return istft_overlap_add(frames_ri, gen.istft_n_fft,
                             precision=head_precision)
