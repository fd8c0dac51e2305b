"""Core acoustic-model layers: FFT block, attention, conv-FFN, PostNet, predictors.

TPU-first re-design of the reference transformer stack
(reference scripts/transformer/{Layers,SubLayers,Modules}.py and
scripts/model/modules.py:161-213). Differences from the reference that are
deliberate TPU idioms, not behavior changes:

  * attention is a single batched einsum chain (B, H, T, T) instead of the
    reference's head-folded bmm loop (SubLayers.py:40-52) — identical math,
    MXU-friendly layout;
  * all sequence ops are static-shaped and masked; no data-dependent shapes
    inside jit;
  * conv-FFN / PostNet use feature-last nn.Conv, which XLA lowers to MXU
    matmuls for kernel-size-1 and im2col for k>1.

Semantics preserved exactly: post-LayerNorm residuals, mask-fill-zero after
each FFT sub-block, -inf attention masking, dropout placement.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def sinusoid_position_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sinusoid position table (reference transformer/Models.py:13-33)."""
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    dim = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float64)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table.astype(np.float32)


class MultiHeadAttention(nn.Module):
    """Post-LN multi-head self-attention (reference SubLayers.py:8-57).

    The XLA path uses the measured-fastest formulation (docs/PERF.md):
    einsums on the native (B, T, H, d) projection layout (no head
    transposes) and, when the caller supplies `key_pad_mask`, a
    (B, 1, 1, T) key-padding `where` instead of the materialized
    (B, T, T) `attn_mask` — bit-exact vs the textbook transpose+bmm
    chain but 1.29x faster at the serving shape on v5e (full acoustic
    forward 36.3 -> 28.1 ms), for training and inference on every
    backend. `attn_mask` is still honored when no key mask is given
    (general masks).

    fused_kernel routes the logits->mask->softmax->attention@V core
    through the Pallas kernel `ops/pallas_attention.py::flash_mha`
    (TPU-only, inference-only, auto-gated on the kernel's T/dk alignment
    constraints). The kernel beat the OLD transpose-chain XLA path
    (33.2 vs 36.3 ms) but loses to the keymask formulation above
    (28.1 ms) — kept as measured evidence, off by default. The Q/K/V and
    output projections and the residual LayerNorm stay in XLA either
    way, so the parameter tree is identical.
    """

    n_head: int
    d_model: int
    d_k: int
    d_v: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32   # compute precision; params stay f32
    fused_kernel: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: jnp.ndarray | None,
                 deterministic: bool,
                 key_pad_mask: jnp.ndarray | None = None):
        # x: (B, T, D); key_pad_mask: (B, T) True = padding — the fast path
        # (and what the fused kernel consumes). attn_mask: (B, T, T) True =
        # masked, honored only when key_pad_mask is None (general masks);
        # at least one of the two must be provided.
        B, T, _ = x.shape
        residual = x
        q = nn.Dense(self.n_head * self.d_k, dtype=self.dtype, name="w_qs")(x)
        k = nn.Dense(self.n_head * self.d_k, dtype=self.dtype, name="w_ks")(x)
        v = nn.Dense(self.n_head * self.d_v, dtype=self.dtype, name="w_vs")(x)

        # the kernel pads T internally; below T=128 the padding overhead
        # exceeds the fusion win (the T=8 encoder stays on the XLA path)
        from visual_onoma_to_wave_tpu.ops import pallas_attention as pa
        use_fused = (self.fused_kernel and deterministic
                     and key_pad_mask is not None and self.d_k == self.d_v
                     and T >= 128 and self.d_k % 128 == 0
                     and pa.fused_attention_available())
        if use_fused:
            out = pa.flash_mha(q, k, v, key_pad_mask, self.n_head)
        else:
            # no-transpose layout: head axis stays where the projection
            # reshape puts it; einsum handles the contraction directly
            qh = q.reshape(B, T, self.n_head, self.d_k)
            kh = k.reshape(B, T, self.n_head, self.d_k)
            vh = v.reshape(B, T, self.n_head, self.d_v)

            scale = 1.0 / jnp.sqrt(jnp.asarray(self.d_k, jnp.float32))
            # logits, masking and softmax in f32 regardless of compute dtype
            attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                              preferred_element_type=jnp.float32) * scale
            if key_pad_mask is not None:
                # (B, 1, 1, T) key-padding mask: every query row masks the
                # same keys, so the (B, T, T) materialization is pure waste
                attn = jnp.where(key_pad_mask[:, None, None, :],
                                 -jnp.inf, attn)
            else:
                attn = jnp.where(attn_mask[:, None, :, :], -jnp.inf, attn)
            attn = nn.softmax(attn, axis=-1)
            # fully-masked rows (padding queries) softmax to nan; zero them
            # like the reference's post-block mask-fill makes them
            # irrelevant anyway
            attn = jnp.nan_to_num(attn).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh.astype(self.dtype))
            out = out.reshape(B, T, self.n_head * self.d_v)
        out = nn.Dense(self.d_model, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        # post-LN in f32 (flax promotes with the f32 scale/bias params)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(
            out.astype(jnp.float32) + residual.astype(jnp.float32))


class PositionwiseFeedForward(nn.Module):
    """Conv1d FFN: k=9 expand -> ReLU -> k=1 project, post-LN
    (reference SubLayers.py:60-93)."""

    d_in: int
    d_hid: int
    kernel_size: tuple[int, int] = (9, 1)
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool):
        residual = x
        h = nn.Conv(self.d_hid, (self.kernel_size[0],), padding="SAME",
                    dtype=self.dtype, name="w_1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.d_in, (self.kernel_size[1],), padding="SAME",
                    dtype=self.dtype, name="w_2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(
            h.astype(jnp.float32) + residual.astype(jnp.float32))


class FFTBlock(nn.Module):
    """Attention + conv-FFN block with post-sub-block zero masking
    (reference Layers.py:11-30)."""

    d_model: int
    n_head: int
    d_k: int
    d_v: int
    d_inner: int
    kernel_size: tuple[int, int]
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, pad_mask, attn_mask, deterministic: bool):
        # pad_mask: (B, T) True = padding; attn_mask: optional (B, T, T)
        # (unused when pad_mask rides through as the key mask)
        x = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            dtype=self.dtype, fused_kernel=self.fused_attention,
            name="slf_attn",
        )(x, attn_mask, deterministic, key_pad_mask=pad_mask)
        x = jnp.where(pad_mask[:, :, None], 0.0, x)
        x = PositionwiseFeedForward(
            self.d_model, self.d_inner, self.kernel_size, self.dropout,
            dtype=self.dtype, name="pos_ffn",
        )(x, deterministic)
        x = jnp.where(pad_mask[:, :, None], 0.0, x)
        return x


class VariancePredictor(nn.Module):
    """Duration/energy/kurtosis predictor (reference model/modules.py:161-213).

    Two [Conv1d k=3 -> ReLU -> LN -> Dropout] blocks + Linear->1, output
    masked to 0 at padding positions.
    """

    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: jnp.ndarray, deterministic: bool):
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME", name="conv1d_1")(x)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm_1")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.filter_size, (self.kernel_size,), padding="SAME", name="conv1d_2")(h)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm_2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = nn.Dense(1, name="linear_layer")(h)[..., 0]
        return jnp.where(pad_mask, 0.0, out)


class PostNet(nn.Module):
    """5-layer conv PostNet with BatchNorm + tanh (reference Layers.py:67-137).

    Dropout 0.5 is applied after every layer including the last, matching the
    reference forward.
    """

    n_mel_channels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convolutions: int = 5
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool):
        # x: (B, T, n_mels); convs in compute dtype, BatchNorm stats f32
        h = x
        for i in range(self.n_convolutions - 1):
            h = nn.Conv(self.embedding_dim, (self.kernel_size,), padding="SAME",
                        dtype=self.dtype, name=f"conv_{i}")(h)
            h = nn.BatchNorm(use_running_average=deterministic,
                             momentum=0.9, name=f"bn_{i}")(h.astype(jnp.float32))
            h = jnp.tanh(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.n_mel_channels, (self.kernel_size,), padding="SAME",
                    name=f"conv_{self.n_convolutions - 1}")(h.astype(jnp.float32))
        h = nn.BatchNorm(use_running_average=deterministic,
                         momentum=0.9, name=f"bn_{self.n_convolutions - 1}")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h
