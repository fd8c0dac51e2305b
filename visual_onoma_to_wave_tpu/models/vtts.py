"""vTTS acoustic model: Encoder -> audiotype embedding -> VarianceAdaptor ->
Decoder -> mel linear -> PostNet.

TPU-first re-design of reference scripts/model/vtts.py and
scripts/transformer/Models.py. Static-shaped throughout; train vs inference
are two jit specializations (targets present / absent), matching the
reference's dynamic branches without dynamic shapes.

Sequence-length semantics preserved from reference Models.py:165-196:
the decoder position table covers max_seq_len; if the (static) frame length
exceeds it, a longer sinusoid table is materialized at trace time — the JAX
equivalent of the reference's inference-time on-the-fly table.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.config import Config, DatasetMetadata
from visual_onoma_to_wave_tpu.models.layers import (
    FFTBlock,
    PostNet,
    sinusoid_position_table,
)
from visual_onoma_to_wave_tpu.models.variance_adaptor import VarianceAdaptor
from visual_onoma_to_wave_tpu.models.vfe import VisualFeatureExtractor
from visual_onoma_to_wave_tpu.ops.length_regulator import get_mask_from_lengths

PAD_ID = 0  # reference transformer/Constants.py:1


class FFTStack(nn.Module):
    """A stack of FFT blocks with shared masking (encoder/decoder core)."""

    n_layers: int
    d_model: int
    n_head: int
    d_inner: int
    kernel_size: tuple[int, int]
    dropout: float
    dtype: jnp.dtype = jnp.float32
    fused_attention: bool = False

    @nn.compact
    def __call__(self, x, pad_mask, deterministic: bool):
        # attention masking rides the (B, T) pad_mask directly (the module's
        # key_pad_mask fast path); no (B, T, T) attn_mask is materialized
        attn_mask = None
        d_k = self.d_model // self.n_head
        for i in range(self.n_layers):
            x = FFTBlock(
                self.d_model, self.n_head, d_k, d_k, self.d_inner,
                self.kernel_size, self.dropout, dtype=self.dtype,
                fused_attention=self.fused_attention,
                name=f"layer_{i}",
            )(x, pad_mask, attn_mask, deterministic)
        return x


class VTTS(nn.Module):
    """Full acoustic model.

    Construct via `VTTS.from_config(config, metadata, n_vocab)`.
    """

    n_vocab: int
    n_audiotype: int
    hidden: int = 256
    encoder_layers: int = 4
    decoder_layers: int = 6
    n_head: int = 2
    decoder_n_head: int | None = None    # None = same as encoder
    d_inner: int = 1024
    ffn_kernel: tuple[int, int] = (9, 1)
    encoder_dropout: float = 0.2
    decoder_dropout: float = 0.2
    max_seq_len: int = 1000
    max_mel_len: int = 1000
    n_mels: int = 80
    # visual feature extractor
    use_image_default: bool = True
    vfe_kernel: tuple[int, int] = (3, 3)
    vfe_layers: int = 3
    # 1 = gray-scale, 3 = RGB-scale (reference scale_in_training; glyph
    # images are grayscale so RGB is channel replication, matching PIL
    # convert("RGB") in the reference loader)
    vfe_channels: int = 1
    # variance adaptor
    n_bins: int = 256
    vp_filter: int = 256
    vp_kernel: int = 3
    vp_dropout: float = 0.5
    is_energy: bool = True
    is_kurtosis: bool = False
    energy_quantization: str = "linear"
    kurtosis_quantization: str = "linear"
    energy_stats: tuple[float, float, float, float] = (-1.0, 1.0, 0.0, 1.0)
    kurtosis_stats: tuple[float, float, float, float] = (-1.0, 1.0, 0.0, 1.0)
    multi_audiotype: bool = True
    # PostNet conv width (reference hardcodes 512, Layers.py:75; kept
    # configurable for small deployments — the PostNet dominates the
    # parameter count of reduced-size models)
    postnet_dim: int = 512
    # compute precision for the FFT stacks + PostNet (params, LayerNorm,
    # softmax, variance predictors and the mel head stay f32)
    dtype: jnp.dtype = jnp.float32
    # route the attention softmax core through the fused Pallas kernel
    # (ops/pallas_attention.py) — TPU-only, inference-only; same param
    # tree, auto-falls-back on unaligned shapes (the T=8 encoder).
    # Config knob: model.fused_attention
    fused_attention: bool = False

    @classmethod
    def from_config(cls, config: Config, metadata: Optional[DatasetMetadata] = None,
                    n_vocab: int = 64, max_mel_len: Optional[int] = None) -> "VTTS":
        m = config.model
        t = m.transformer
        if t.decoder_hidden != t.encoder_hidden:
            # the length-regulated encoder output feeds the decoder directly
            # (no projection), exactly like the reference (Models.py:165) —
            # differing hiddens would silently mis-shape there too
            raise ValueError(
                f"decoder_hidden ({t.decoder_hidden}) must equal "
                f"encoder_hidden ({t.encoder_hidden})")
        kwargs = dict(
            n_vocab=n_vocab,
            n_audiotype=metadata.n_audiotype if metadata else 10,
            hidden=t.encoder_hidden,
            encoder_layers=t.encoder_layer,
            decoder_layers=t.decoder_layer,
            n_head=t.encoder_head,
            decoder_n_head=t.decoder_head,
            d_inner=t.conv_filter_size,
            ffn_kernel=tuple(t.conv_kernel_size),
            encoder_dropout=t.encoder_dropout,
            decoder_dropout=t.decoder_dropout,
            max_seq_len=m.max_seq_len,
            max_mel_len=max_mel_len or config.train.max_mel_len,
            n_mels=config.audio.mel.n_mel_channels,
            use_image_default=config.train.use_image,
            vfe_kernel=tuple(m.visual_feature_extractor.conv_kernel_size),
            vfe_layers=m.visual_feature_extractor.layer_num,
            vfe_channels=(3 if config.visual_text.scale_in_training
                          == "RGB-scale" else 1),
            n_bins=m.variance_embedding.n_bins,
            vp_filter=m.variance_predictor.filter_size,
            vp_kernel=m.variance_predictor.kernel_size,
            vp_dropout=m.variance_predictor.dropout,
            is_energy=m.variance_embedding.is_energy_condition,
            is_kurtosis=m.variance_embedding.is_kurtosis_condition,
            energy_quantization=m.variance_embedding.energy_quantization,
            kurtosis_quantization=m.variance_embedding.kurtosis_quantization,
            multi_audiotype=m.multi_audiotype,
            postnet_dim=m.postnet_channels,
            fused_attention=m.fused_attention,
            dtype=(jnp.bfloat16
                   if config.train.compute_dtype in ("bfloat16", "bf16")
                   else jnp.float32),
        )
        if metadata is not None:
            kwargs["energy_stats"] = (
                metadata.energy_stats.min, metadata.energy_stats.max,
                metadata.energy_stats.mean, metadata.energy_stats.std)
            kwargs["kurtosis_stats"] = (
                metadata.kurtosis_stats.min, metadata.kurtosis_stats.max,
                metadata.kurtosis_stats.mean, metadata.kurtosis_stats.std)
        return cls(**kwargs)

    def _position_table(self, length: int):
        n = max(self.max_seq_len + 1, length)
        return jnp.asarray(sinusoid_position_table(n, self.hidden))[:length]

    @nn.compact
    def __call__(
        self,
        audiotypes: jnp.ndarray,          # (B,)
        texts: jnp.ndarray,               # (B, C) int32, 0-padded
        src_lens: jnp.ndarray,            # (B,)
        image_cells: Optional[jnp.ndarray] = None,   # (B, C, H, Wc) in [0,1]
        energy_targets: Optional[jnp.ndarray] = None,
        kurtosis_targets: Optional[jnp.ndarray] = None,
        duration_targets: Optional[jnp.ndarray] = None,
        use_image: bool = True,
        e_control=1.0,                    # scalar or per-item (B,) array
        d_control=1.0,                    # scalar or per-item (B,) array
        deterministic: bool = True,
        max_mel_len: int | None = None,
    ):
        B, C = texts.shape
        src_pad_mask = get_mask_from_lengths(src_lens, C)

        # ------------------------------ Encoder ---------------------------
        if use_image:
            assert image_cells is not None
            emb = VisualFeatureExtractor(
                embed_dim=self.hidden, kernel_size=self.vfe_kernel,
                num_convolutions=self.vfe_layers,
                channels=self.vfe_channels, name="vfe",
            )(image_cells, deterministic)
        else:
            emb = nn.Embed(self.n_vocab + 1, self.hidden, name="src_word_emb")(texts)
        x = emb + self._position_table(C)[None, :, :]
        x = FFTStack(
            self.encoder_layers, self.hidden, self.n_head, self.d_inner,
            self.ffn_kernel, self.encoder_dropout, dtype=self.dtype,
            fused_attention=self.fused_attention,
            name="encoder",
        )(x, src_pad_mask, deterministic)

        # --------------------- audiotype conditioning ---------------------
        if self.multi_audiotype:
            at = nn.Embed(self.n_audiotype, self.hidden, name="audiotype_emb")(audiotypes)
            x = x + at[:, None, :]

        # ------------------------- Variance adaptor -----------------------
        (
            x, e_pred, k_pred, log_d_pred, d_rounded, mel_len, mel_pad_mask,
        ) = VarianceAdaptor(
            hidden=self.hidden, n_bins=self.n_bins,
            filter_size=self.vp_filter, kernel_size=self.vp_kernel,
            dropout=self.vp_dropout,
            is_energy=self.is_energy, is_kurtosis=self.is_kurtosis,
            energy_quantization=self.energy_quantization,
            kurtosis_quantization=self.kurtosis_quantization,
            energy_stats=self.energy_stats, kurtosis_stats=self.kurtosis_stats,
            max_mel_len=self.max_mel_len, name="variance_adaptor",
        )(
            x, src_pad_mask,
            energy_target=energy_targets, kurtosis_target=kurtosis_targets,
            duration_target=duration_targets,
            e_control=e_control, d_control=d_control,
            deterministic=deterministic,
            max_mel_len=max_mel_len,
        )

        # ------------------------------ Decoder ---------------------------
        T = x.shape[1]
        x = x + self._position_table(T)[None, :, :]
        x = FFTStack(
            self.decoder_layers, self.hidden,
            self.decoder_n_head or self.n_head, self.d_inner,
            self.ffn_kernel, self.decoder_dropout, dtype=self.dtype,
            fused_attention=self.fused_attention,
            name="decoder",
        )(x, mel_pad_mask, deterministic)

        mel = nn.Dense(self.n_mels, name="mel_linear")(x.astype(jnp.float32))
        postnet_mel = mel + PostNet(
            n_mel_channels=self.n_mels, embedding_dim=self.postnet_dim,
            dtype=self.dtype, name="postnet",
        )(mel, deterministic)

        return {
            "mel": mel,
            "postnet_mel": postnet_mel,
            "energy_pred": e_pred,
            "kurtosis_pred": k_pred,
            "log_duration_pred": log_d_pred,
            "duration_rounded": d_rounded,
            "src_pad_mask": src_pad_mask,
            "mel_pad_mask": mel_pad_mask,
            "src_lens": src_lens,
            "mel_lens": mel_len,
        }
