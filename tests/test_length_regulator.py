"""Tests for the vectorized length regulator and mask/expand helpers.

Golden: a direct numpy transcription of the reference LR loop
(reference scripts/model/modules.py:132-155).
"""
import numpy as np
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.ops import (
    expand_char_to_frame,
    get_mask_from_lengths,
    length_regulate,
)


def reference_lr(x, durations, max_len):
    """numpy transcription of reference LengthRegulator.LR."""
    outs, lens = [], []
    for xb, db in zip(x, durations):
        rows = [np.repeat(xb[i : i + 1], int(d), axis=0) for i, d in enumerate(db)]
        e = np.concatenate(rows, axis=0) if rows else np.zeros((0, x.shape[-1]))
        lens.append(e.shape[0])
        pad = np.zeros((max_len - e.shape[0], x.shape[-1]), x.dtype)
        outs.append(np.concatenate([e, pad], axis=0))
    return np.stack(outs), np.array(lens)


def test_length_regulate_matches_reference(rng):
    B, C, D, T = 3, 5, 8, 40
    x = rng.standard_normal((B, C, D)).astype(np.float32)
    dur = np.array(
        [[3, 0, 5, 2, 1], [10, 10, 10, 0, 0], [1, 1, 1, 1, 1]], dtype=np.int32
    )
    golden, golden_len = reference_lr(x, dur, T)
    out, mel_len = length_regulate(jnp.asarray(x), jnp.asarray(dur), T)
    np.testing.assert_allclose(np.asarray(out), golden, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mel_len), golden_len)


def test_length_regulate_clips_overflow(rng):
    x = rng.standard_normal((1, 3, 4)).astype(np.float32)
    dur = np.array([[10, 10, 10]], dtype=np.int32)
    out, mel_len = length_regulate(jnp.asarray(x), jnp.asarray(dur), 16)
    assert int(mel_len[0]) == 16
    # first 10 frames = char0, next 6 = char1
    np.testing.assert_allclose(np.asarray(out[0, :10]), np.tile(x[0, 0], (10, 1)), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[0, 10:16]), np.tile(x[0, 1], (6, 1)), atol=1e-6)


def test_mask_from_lengths():
    m = np.asarray(get_mask_from_lengths(jnp.array([2, 4, 0]), 5))
    expected = np.array([
        [False, False, True, True, True],
        [False, False, False, False, True],
        [True, True, True, True, True],
    ])
    np.testing.assert_array_equal(m, expected)


def test_expand_char_to_frame():
    vals = jnp.array([1.0, 2.0, 3.0])
    dur = jnp.array([2, 0, 3], dtype=jnp.int32)
    out = np.asarray(expand_char_to_frame(vals, dur, 8))
    np.testing.assert_allclose(out, [1, 1, 3, 3, 3, 0, 0, 0])


def test_length_regulate_gradients_flow(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((2, 4, 3)).astype(np.float32))
    dur = jnp.array([[2, 3, 0, 1], [1, 1, 1, 1]], dtype=jnp.int32)

    def loss(x):
        out, _ = length_regulate(x, dur, 10)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    # char with zero duration receives zero gradient
    assert np.abs(np.asarray(g[0, 2])).sum() == 0.0
    assert np.abs(np.asarray(g[0, 0])).sum() > 0.0
