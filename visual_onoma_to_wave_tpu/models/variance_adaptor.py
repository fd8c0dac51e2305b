"""Variance adaptor: duration/energy/kurtosis prediction + length regulation.

Re-design of reference scripts/model/modules.py:16-159 with the Python-loop
length regulator replaced by the vectorized gather in ops/length_regulator.py.

Quantization parity: torch.bucketize(v, boundaries) with right=False equals
jnp.searchsorted(boundaries, v, side='left'); boundaries are n_bins-1 points
linspaced (or log-spaced) between the stats.json min/max.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from visual_onoma_to_wave_tpu.ops.length_regulator import (
    get_mask_from_lengths,
    length_regulate,
)
from visual_onoma_to_wave_tpu.models.layers import VariancePredictor


def _make_bins(vmin: float, vmax: float, n_bins: int, quantization: str) -> np.ndarray:
    if quantization == "log":
        return np.exp(np.linspace(np.log(vmin), np.log(vmax), n_bins - 1)).astype(np.float32)
    return np.linspace(vmin, vmax, n_bins - 1).astype(np.float32)


def _control_column(c):
    """Normalize an e/d control to broadcast against (B, C) predictions.

    Accepts a python/traced scalar (one value for the whole batch — the
    reference's only mode, modules.py:58-63,113) or a (B,)/(B, 1) per-item
    array (serving extension: items with different controls can share one
    device batch). Controls are pure multiplications, so they stay TRACED
    jit arguments — new control values never trigger a recompile."""
    if isinstance(c, (int, float)):
        return c
    c = jnp.asarray(c)
    return c[:, None] if c.ndim == 1 else c


class VarianceAdaptor(nn.Module):
    hidden: int = 256
    n_bins: int = 256
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5
    is_energy: bool = True
    is_kurtosis: bool = False
    energy_quantization: str = "linear"
    kurtosis_quantization: str = "linear"
    # stats.json values: (min, max, mean, std)
    energy_stats: tuple[float, float, float, float] = (-1.0, 1.0, 0.0, 1.0)
    kurtosis_stats: tuple[float, float, float, float] = (-1.0, 1.0, 0.0, 1.0)
    max_mel_len: int = 1000

    def setup(self):
        self.duration_predictor = VariancePredictor(
            self.filter_size, self.kernel_size, self.dropout, name="duration_predictor")
        if self.is_energy:
            self.energy_predictor = VariancePredictor(
                self.filter_size, self.kernel_size, self.dropout, name="energy_predictor")
            self.energy_embedding = nn.Embed(self.n_bins, self.hidden, name="energy_embedding")
            self.energy_bins = jnp.asarray(_make_bins(
                self.energy_stats[0], self.energy_stats[1], self.n_bins,
                self.energy_quantization))
        if self.is_kurtosis:
            self.kurtosis_predictor = VariancePredictor(
                self.filter_size, self.kernel_size, self.dropout, name="kurtosis_predictor")
            self.kurt_embedding = nn.Embed(self.n_bins, self.hidden, name="kurt_embedding")
            self.kurt_bins = jnp.asarray(_make_bins(
                self.kurtosis_stats[0], self.kurtosis_stats[1], self.n_bins,
                self.kurtosis_quantization))

    def _variance_embedding(self, predictor, embedding, bins, mean, std,
                            x, target, pad_mask, control, deterministic):
        """Train: embed the target; infer: de-norm prediction, scale, re-norm,
        bucketize (reference modules.py:53-77)."""
        prediction = predictor(x, pad_mask, deterministic)
        if target is not None:
            ids = jnp.searchsorted(bins, target, side="left")
        else:
            p = prediction * std + mean
            p = p * control
            prediction = (p - mean) / std
            ids = jnp.searchsorted(bins, prediction, side="left")
        return prediction, embedding(ids)

    def __call__(
        self,
        x: jnp.ndarray,                  # (B, C, D) encoder output
        src_pad_mask: jnp.ndarray,       # (B, C) True = padding
        energy_target=None,              # (B, C) or None
        kurtosis_target=None,
        duration_target=None,            # (B, C) int or None
        e_control=1.0,                   # scalar or per-item (B,) array
        d_control=1.0,                   # scalar or per-item (B,) array
        deterministic: bool = True,
        max_mel_len: int | None = None,  # static output frame length
    ):
        if max_mel_len is None:
            max_mel_len = self.max_mel_len
        e_control = _control_column(e_control)
        d_control = _control_column(d_control)
        log_duration_prediction = self.duration_predictor(x, src_pad_mask, deterministic)

        energy_prediction = None
        if self.is_energy:
            energy_prediction, emb = self._variance_embedding(
                self.energy_predictor, self.energy_embedding, self.energy_bins,
                self.energy_stats[2], self.energy_stats[3],
                x, energy_target, src_pad_mask, e_control, deterministic)
            x = x + emb
        kurtosis_prediction = None
        if self.is_kurtosis:
            kurtosis_prediction, emb = self._variance_embedding(
                self.kurtosis_predictor, self.kurt_embedding, self.kurt_bins,
                self.kurtosis_stats[2], self.kurtosis_stats[3],
                x, kurtosis_target, src_pad_mask, 1.0, deterministic)
            x = x + emb

        if duration_target is not None:
            duration_rounded = duration_target
        else:
            # clamp(round(exp(log_d) - 1) * d_control, min=0); padding rows
            # predict 0 (log_d masked to 0 -> exp(0)-1 = 0), matching reference
            duration_rounded = jnp.maximum(
                jnp.round(jnp.exp(log_duration_prediction) - 1.0) * d_control, 0.0
            )
            duration_rounded = jnp.where(src_pad_mask, 0.0, duration_rounded)
        x, mel_len = length_regulate(
            x, duration_rounded.astype(jnp.int32), max_mel_len)
        mel_pad_mask = get_mask_from_lengths(mel_len, max_mel_len)

        return (
            x,
            energy_prediction,
            kurtosis_prediction,
            log_duration_prediction,
            duration_rounded,
            mel_len,
            mel_pad_mask,
        )
