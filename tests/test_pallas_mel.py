"""Parity of the fused Pallas mel frontend vs the jnp reference path.

Runs in pallas interpret mode on the CPU test mesh; on TPU the same kernel
compiles natively (exercised by bench.py).
"""
import numpy as np
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.ops.stft import (
    hann_window, melscale_fbanks, logmel_and_energy, _reflect_pad_1d)
from visual_onoma_to_wave_tpu.ops.pallas_mel import pallas_logmel_energy


def test_pallas_logmel_energy_matches_jnp():
    rng = np.random.default_rng(0)
    n_fft, hop, sr = 1024, 256, 22050
    samples = 3 * hop * 17 + 5  # awkward length
    audio = rng.uniform(-0.8, 0.8, (2, samples)).astype(np.float32)

    window = jnp.asarray(hann_window(n_fft))
    fb = jnp.asarray(melscale_fbanks(n_fft // 2 + 1, 0.0, 8000.0, 80, sr))
    padded = _reflect_pad_1d(jnp.asarray(audio), n_fft // 2)

    ref_mel, ref_energy = logmel_and_energy(jnp.asarray(audio), window, fb,
                                            n_fft, hop, n_fft)
    got_mel, got_energy = pallas_logmel_energy(
        padded, n_fft=n_fft, hop_length=hop, win_length=n_fft, n_mels=80,
        sampling_rate=sr, tile_t=128, interpret=True)

    assert got_mel.shape == ref_mel.shape
    assert got_energy.shape == ref_energy.shape
    np.testing.assert_allclose(np.asarray(got_mel), np.asarray(ref_mel),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_energy), np.asarray(ref_energy),
                               atol=1e-2, rtol=1e-4)


def test_pallas_logmel_energy_odd_batch_and_short_clip():
    rng = np.random.default_rng(1)
    n_fft, hop, sr = 1024, 256, 22050
    audio = rng.uniform(-1, 1, (3, 2048)).astype(np.float32)
    padded = _reflect_pad_1d(jnp.asarray(audio), n_fft // 2)
    window = jnp.asarray(hann_window(n_fft))
    fb = jnp.asarray(melscale_fbanks(n_fft // 2 + 1, 0.0, 8000.0, 80, sr))
    ref_mel, ref_energy = logmel_and_energy(jnp.asarray(audio), window, fb,
                                            n_fft, hop, n_fft)
    got_mel, got_energy = pallas_logmel_energy(
        padded, n_fft=n_fft, hop_length=hop, win_length=n_fft,
        sampling_rate=sr, interpret=True)
    np.testing.assert_allclose(np.asarray(got_mel), np.asarray(ref_mel),
                               atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_energy), np.asarray(ref_energy),
                               atol=1e-2, rtol=1e-4)
