"""FastSpeech2 loss: masked MAE for mel / postnet-mel, masked MSE for
char-level energy, kurtosis and log-duration.

Semantics follow reference scripts/model/loss.py:7-87. The reference uses
masked_select + reduction-mean; here we compute masked means directly (sum of
masked errors / count) — identical value, static-shaped.
"""
from __future__ import annotations

import jax.numpy as jnp


def _masked_mean(err: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    valid = valid.astype(err.dtype)
    return jnp.sum(err * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def fastspeech2_loss(outputs: dict, batch: dict) -> dict:
    """Compute the six-loss bundle.

    outputs: VTTS output dict (see models/vtts.py)
    batch: dict with 'mels' (B, T, n_mels), 'energies' (B, C) or None,
           'kurtoses' (B, C) or None, 'durations' (B, C)
    """
    src_valid = ~outputs["src_pad_mask"]        # (B, C) True = real char
    mel_valid = ~outputs["mel_pad_mask"]        # (B, T) True = real frame

    mel_t = batch["mels"]
    mel_err = jnp.abs(outputs["mel"] - mel_t)
    mel_loss = _masked_mean(jnp.sum(mel_err, axis=-1), mel_valid) / mel_t.shape[-1]
    postnet_err = jnp.abs(outputs["postnet_mel"] - mel_t)
    postnet_mel_loss = _masked_mean(jnp.sum(postnet_err, axis=-1), mel_valid) / mel_t.shape[-1]

    log_d_target = jnp.log(batch["durations"].astype(jnp.float32) + 1.0)
    duration_loss = _masked_mean(
        (outputs["log_duration_pred"] - log_d_target) ** 2, src_valid)

    if outputs["energy_pred"] is not None and batch.get("energies") is not None:
        energy_loss = _masked_mean(
            (outputs["energy_pred"] - batch["energies"]) ** 2, src_valid)
    else:
        energy_loss = jnp.float32(0.0)

    if outputs["kurtosis_pred"] is not None and batch.get("kurtoses") is not None:
        kurtosis_loss = _masked_mean(
            (outputs["kurtosis_pred"] - batch["kurtoses"]) ** 2, src_valid)
    else:
        kurtosis_loss = jnp.float32(0.0)

    total = mel_loss + postnet_mel_loss + duration_loss + energy_loss + kurtosis_loss
    return {
        "total_loss": total,
        "mel_loss": mel_loss,
        "postnet_mel_loss": postnet_mel_loss,
        "energy_loss": energy_loss,
        "kurtosis_loss": kurtosis_loss,
        "duration_loss": duration_loss,
    }
