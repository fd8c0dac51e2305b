"""MelGAN generator (inference) in JAX/flax — the reference's alternative
vocoder family (reference scripts/utils/model.py:45-55 loads
descriptinc/melgan-neurips via torch.hub; vocoder_infer at :77 feeds it
mel / ln(10), i.e. log10-domain mels).

Architecture (melgan-neurips mel2wav Generator, input_size=80, ngf=32,
n_residual_layers=3, ratios 8/8/2/2):

    reflect-pad 3 -> conv7 (80 -> 512)
    per ratio r: leaky(0.2) -> convT(k=2r, stride=r, pad=r//2), channels halve
                 -> 3x ResnetBlock(dilation 3^j)
    leaky(0.2) -> reflect-pad 3 -> conv7 (32 -> 1) -> tanh

ResnetBlock(dim, d): shortcut conv1x1(x) + [leaky -> reflect-pad d ->
conv3 dilated d -> leaky -> conv1x1].

All convs are weight-normed in torch; weights are folded at conversion time
(same as the HiFi-GAN converter). Transposed convs reuse the exact-parity
lhs-dilated formulation from models/hifigan.py.
"""
from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from visual_onoma_to_wave_tpu.models.hifigan import (
    _conv_transpose1d,
    _t_conv,
    _t_convtr,
)

LRELU_SLOPE = 0.2
LN10 = float(np.log(10.0))


def _conv1d_reflect(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                    dilation: int = 1) -> jnp.ndarray:
    """1-D conv with torch ReflectionPad1d(dilation*(k-1)//2) semantics.
    x: (B, T, Cin); w: (K, Cin, Cout)."""
    k = w.shape[0]
    pad = dilation * (k - 1) // 2
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(0, 0)], rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + b


class MelGANResnetBlock(nn.Module):
    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w1 = self.param("conv1_w", nn.initializers.normal(0.02),
                        (3, self.dim, self.dim))
        b1 = self.param("conv1_b", nn.initializers.zeros, (self.dim,))
        w2 = self.param("conv2_w", nn.initializers.normal(0.02),
                        (1, self.dim, self.dim))
        b2 = self.param("conv2_b", nn.initializers.zeros, (self.dim,))
        ws = self.param("shortcut_w", nn.initializers.normal(0.02),
                        (1, self.dim, self.dim))
        bs = self.param("shortcut_b", nn.initializers.zeros, (self.dim,))
        h = nn.leaky_relu(x, LRELU_SLOPE)
        h = _conv1d_reflect(h, w1, b1, dilation=self.dilation)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        h = _conv1d_reflect(h, w2, b2)
        s = _conv1d_reflect(x, ws, bs)
        return s + h


class MelGANGenerator(nn.Module):
    """log10-domain mel (B, T, n_mels) -> waveform (B, T * prod(ratios))."""

    n_mels: int = 80
    ngf: int = 32
    n_residual_layers: int = 3
    ratios: tuple[int, ...] = (8, 8, 2, 2)

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        # padding r//2 with output_padding 0 matches melgan-neurips
        # (padding=r//2+r%2, output_padding=r%2) only for even ratios
        assert all(r % 2 == 0 for r in self.ratios), (
            f"MelGANGenerator supports even upsample ratios only, got "
            f"{self.ratios}")
        mult = 2 ** len(self.ratios)
        ch = mult * self.ngf
        w = self.param("conv_pre_w", nn.initializers.normal(0.02),
                       (7, self.n_mels, ch))
        b = self.param("conv_pre_b", nn.initializers.zeros, (ch,))
        x = _conv1d_reflect(mel, w, b)

        for i, r in enumerate(self.ratios):
            cin, cout = ch, ch // 2
            x = nn.leaky_relu(x, LRELU_SLOPE)
            wt = self.param(f"up_{i}_w", nn.initializers.normal(0.02),
                            (2 * r, cin, cout))
            bt = self.param(f"up_{i}_b", nn.initializers.zeros, (cout,))
            # k=2r, torch padding r//2 (+ output_padding r%2, zero for even r)
            x = _conv_transpose1d(x, wt, bt, stride=r, torch_padding=r // 2)
            for j in range(self.n_residual_layers):
                x = MelGANResnetBlock(cout, 3 ** j,
                                      name=f"resblock_{i}_{j}")(x)
            ch = cout

        x = nn.leaky_relu(x, LRELU_SLOPE)
        w = self.param("conv_post_w", nn.initializers.normal(0.02),
                       (7, self.ngf, 1))
        b = self.param("conv_post_b", nn.initializers.zeros, (1,))
        x = _conv1d_reflect(x, w, b)
        return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (torch.hub melgan-neurips mel2wav layout)
# ---------------------------------------------------------------------------

def convert_melgan_state_dict(
    state: dict,
    ratios=(8, 8, 2, 2),
    n_residual_layers: int = 3,
) -> dict:
    """Map the sequential `model.{idx}` layout of the torch generator onto
    this module's parameter pytree. Sequential indices follow the torch
    construction order: [pad, conv_pre] + per ratio [leaky, convT,
    resblock x n] + [leaky, pad, conv_post, tanh]."""
    assert all(r % 2 == 0 for r in ratios), (
        f"even upsample ratios required (odd ratios need output_padding=1, "
        f"unsupported), got {ratios}")
    state = {k.replace("mel2wav.", ""): v for k, v in state.items()}
    params: dict = {}
    w, b = _t_conv(state, "model.1")
    params["conv_pre_w"], params["conv_pre_b"] = w, b
    idx = 2
    for i in range(len(ratios)):
        idx += 1  # LeakyReLU
        w, b = _t_convtr(state, f"model.{idx}")
        params[f"up_{i}_w"], params[f"up_{i}_b"] = w, b
        idx += 1
        for j in range(n_residual_layers):
            blk: dict = {}
            w, b = _t_conv(state, f"model.{idx}.block.2")
            blk["conv1_w"], blk["conv1_b"] = w, b
            w, b = _t_conv(state, f"model.{idx}.block.4")
            blk["conv2_w"], blk["conv2_b"] = w, b
            w, b = _t_conv(state, f"model.{idx}.shortcut")
            blk["shortcut_w"], blk["shortcut_b"] = w, b
            params[f"resblock_{i}_{j}"] = blk
            idx += 1
    idx += 2  # LeakyReLU, ReflectionPad
    w, b = _t_conv(state, f"model.{idx}")
    params["conv_post_w"], params["conv_post_b"] = w, b
    return jax.tree.map(jnp.asarray, params)


def load_torch_melgan(ckpt_path: str) -> dict:
    """Load a melgan-neurips generator checkpoint into a params pytree."""
    import torch

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = obj.get("model", obj) if isinstance(obj, dict) else obj
    state = {k: np.asarray(v) for k, v in state.items()}
    return {"params": convert_melgan_state_dict(state)}


@functools.partial(jax.jit, static_argnums=0)
def _infer(gen: MelGANGenerator, params, mels: jnp.ndarray) -> jnp.ndarray:
    return gen.apply(params, mels / LN10)


def melgan_infer(params, mels: jnp.ndarray, lengths=None,
                 hop_length: int = 256, gen: MelGANGenerator | None = None):
    """Batched natural-log mel -> waveform. The torch hub wrapper expects
    log10 mels, so divide by ln(10) first (reference utils/model.py:77).

    Jitted once per (generator config, mel shape) via a module-level cache —
    flax modules hash by field values — so repeated calls reuse the compiled
    executable (and its one-time upload on the tunneled TPU)."""
    if gen is None:
        gen = MelGANGenerator()
    wavs = _infer(gen, params, mels)
    if lengths is not None:
        sample_lens = np.asarray(lengths) * hop_length
    else:
        sample_lens = np.full((mels.shape[0],), wavs.shape[1])
    return wavs, sample_lens
