"""Vectorized length regulator (the FastSpeech2 char->frame expansion).

The reference implements this as a per-sample Python loop with torch.expand
and concatenation (reference scripts/model/modules.py:126-159) — a host/device
sync point on every step. Here it is a single fixed-size gather:

    frame_to_char[t] = searchsorted(cumsum(durations), t, side='right')
    out[t] = x[frame_to_char[t]]     (masked 0 for t >= sum(durations))

which is O(max_len), fully batched, static-shaped and differentiable (gradients
flow back to x via the gather; durations are integer targets, no gradient —
matching the reference where durations enter LR as rounded targets).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("max_mel_len",))
def length_regulate(
    x: jnp.ndarray,
    durations: jnp.ndarray,
    max_mel_len: int,
):
    """Expand character-level features to frame level.

    x:         (B, C, D)  character-level hidden states
    durations: (B, C)     int32 per-character frame counts (zero-padded)
    max_mel_len: static output length

    Returns:
      out:      (B, max_mel_len, D) frame-level features, zero beyond mel_len
      mel_len:  (B,) int32 = clip(sum(durations), max=max_mel_len)
    """
    durations = durations.astype(jnp.int32)
    bounds = jnp.cumsum(durations, axis=-1)                    # (B, C)
    total = bounds[:, -1]                                      # (B,)
    frame_idx = jnp.arange(max_mel_len, dtype=jnp.int32)       # (T,)

    # (B, T): char index owning each output frame
    char_idx = jax.vmap(
        lambda b: jnp.searchsorted(b, frame_idx, side="right")
    )(bounds)
    valid = frame_idx[None, :] < total[:, None]                # (B, T)
    char_idx = jnp.where(valid, char_idx, 0)

    out = jnp.take_along_axis(x, char_idx[:, :, None], axis=1)  # (B, T, D)
    out = jnp.where(valid[:, :, None], out, 0.0)
    mel_len = jnp.minimum(total, max_mel_len)
    return out, mel_len


def get_mask_from_lengths(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """Padding mask: True where position >= length (reference utils/tools.py:164-171)."""
    ids = jnp.arange(max_len, dtype=lengths.dtype)
    return ids[None, :] >= lengths[:, None]


@functools.partial(jax.jit, static_argnames=("max_len",))
def expand_char_to_frame(
    values: jnp.ndarray, durations: jnp.ndarray, max_len: int
) -> jnp.ndarray:
    """Expand per-character scalars to per-frame (reference utils/tools.py:173-177).

    values:    (C,) per-character values
    durations: (C,) int32
    returns:   (max_len,) frame-level values (0 beyond total duration)
    """
    durations = durations.astype(jnp.int32)
    bounds = jnp.cumsum(durations)
    frame_idx = jnp.arange(max_len, dtype=jnp.int32)
    char_idx = jnp.searchsorted(bounds, frame_idx, side="right")
    valid = frame_idx < bounds[-1]
    char_idx = jnp.where(valid, char_idx, 0)
    return jnp.where(valid, values[char_idx], 0.0)
