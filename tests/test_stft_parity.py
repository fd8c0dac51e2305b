"""Golden-numerics tests for the DSP core vs torch.stft.

The reference preprocesses with torchaudio Spectrogram + MelScale
(reference preprocessor.py:22-36). torchaudio is not installed here, but
torchaudio.transforms.Spectrogram(power=1, center=True) is exactly
|torch.stft(center=True, pad_mode='reflect', hann window)| and MelScale is a
matmul with melscale_fbanks(norm='slaney', mel_scale='htk') — we rebuild that
golden path with torch.stft + an independently-written numpy filterbank and
compare our JAX pipeline against it. Gate: mel MAE < 1e-3 (BASELINE.md).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from visual_onoma_to_wave_tpu.ops import stft as vstft


SR, N_FFT, HOP, WIN, N_MELS = 22050, 1024, 256, 1024, 80


def torch_magspec(audio: np.ndarray) -> np.ndarray:
    x = torch.from_numpy(audio).clip(-1, 1)
    spec = torch.stft(
        x,
        n_fft=N_FFT,
        hop_length=HOP,
        win_length=WIN,
        window=torch.hann_window(WIN),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.abs().numpy()


def golden_mel_fb() -> np.ndarray:
    """Independent (torch-float32) construction of the HTK/slaney filterbank,
    mirroring torchaudio.functional.melscale_fbanks semantics."""
    all_freqs = torch.linspace(0, SR // 2, N_FFT // 2 + 1)
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)
    m_pts = torch.linspace(hz2mel(0.0), hz2mel(8000.0), N_MELS + 2)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = torch.clamp(torch.min(down, up), min=0.0)
    enorm = 2.0 / (f_pts[2:N_MELS + 2] - f_pts[:N_MELS])
    return (fb * enorm.unsqueeze(0)).numpy()


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    t = np.arange(SR, dtype=np.float32) / SR  # 1 second
    sig = (
        0.5 * np.sin(2 * np.pi * 440 * t)
        + 0.3 * np.sin(2 * np.pi * 1337 * t)
        + 0.1 * rng.standard_normal(SR)
    ).astype(np.float32)
    return np.clip(sig, -1, 1)


def test_window_matches_torch():
    ours = vstft.hann_window(WIN)
    theirs = torch.hann_window(WIN).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_magnitude_spectrogram_matches_torch_stft(audio):
    golden = torch_magspec(audio)
    ours = np.asarray(
        vstft.magnitude_spectrogram(
            jnp.asarray(audio), jnp.asarray(vstft.hann_window(WIN)), N_FFT, HOP, WIN
        )
    )
    assert ours.shape == golden.shape
    assert np.abs(ours - golden).mean() < 1e-4
    np.testing.assert_allclose(ours, golden, atol=5e-3)


def test_mel_filterbank_matches_golden():
    ours = vstft.melscale_fbanks(N_FFT // 2 + 1, 0.0, 8000.0, N_MELS, SR)
    golden = golden_mel_fb()
    # torchaudio uses linspace(0, sr//2); we use sr/2 — identical for even sr
    np.testing.assert_allclose(ours, golden, atol=2e-5)
    # every mel bin must have nonzero support
    assert (ours.sum(axis=0) > 0).all()


def test_logmel_and_energy_match_reference_chain(audio):
    mag = torch_magspec(audio)
    mel_golden = np.log(np.maximum(golden_mel_fb().T @ mag, 1e-5))
    energy_golden = np.linalg.norm(mag, axis=0)

    pipe = vstft.MelPipeline(SR, N_FFT, HOP, WIN, N_MELS, 0.0, 8000.0)
    logmel, energy = pipe(jnp.asarray(audio))
    logmel, energy = np.asarray(logmel), np.asarray(energy)

    assert logmel.shape == (N_MELS, SR // HOP + 1)
    assert np.abs(logmel - mel_golden).mean() < 1e-3  # BASELINE gate
    assert np.abs(energy - energy_golden).mean() < 1e-2
    rel = np.abs(energy - energy_golden) / (np.abs(energy_golden) + 1e-6)
    assert rel.max() < 1e-3


def test_batched_pipeline_vmaps(audio):
    batch = np.stack([audio, np.roll(audio, 1000)])
    pipe = vstft.MelPipeline(SR, N_FFT, HOP, WIN, N_MELS, 0.0, 8000.0)
    logmel, energy = pipe(jnp.asarray(batch))
    assert logmel.shape == (2, N_MELS, SR // HOP + 1)
    assert energy.shape == (2, SR // HOP + 1)
    single, _ = pipe(jnp.asarray(audio))
    np.testing.assert_allclose(np.asarray(logmel[0]), np.asarray(single), atol=1e-5)


def test_spectral_kurtosis_matches_reference_loop(audio):
    """Golden: a direct numpy transcription of the reference estimator
    (preprocessor.py:339-357) run per character segment."""
    durations = np.array([10, 20, 0, 15, 30], dtype=np.int32)
    max_chars = 8
    dur_padded = np.zeros(max_chars, np.int32)
    dur_padded[: len(durations)] = durations

    mag = torch_magspec(audio)
    power = mag ** 2
    eps = 1e-8
    golden = np.zeros(max_chars, np.float32)
    pos = 0
    for i, d in enumerate(durations):
        seg = power[:, pos : pos + d]
        pos += d
        if d == 0:
            continue
        gamma = np.log(seg.mean() + eps) - np.log(seg + eps).mean()
        eta = (3 - gamma + np.sqrt((gamma - 3) ** 2 + 24 * gamma)) / (12 * gamma)
        golden[i] = (eta + 2) * (eta + 3) / (eta * (eta + 1) + eps)

    pipe = vstft.MelPipeline(SR, N_FFT, HOP, WIN, N_MELS, 0.0, 8000.0)
    ours = np.asarray(pipe.kurtosis(jnp.asarray(audio), jnp.asarray(dur_padded), max_chars))
    np.testing.assert_allclose(ours, golden, rtol=2e-3, atol=1e-3)


def test_char_level_energy_matches_reference_loop(audio):
    durations = np.array([7, 13, 0, 21], dtype=np.int32)
    max_chars = 6
    dur_padded = np.zeros(max_chars, np.int32)
    dur_padded[: len(durations)] = durations

    mag = torch_magspec(audio)
    energy = np.linalg.norm(mag, axis=0)
    golden = np.zeros(max_chars, np.float32)
    pos = 0
    for i, d in enumerate(durations):
        golden[i] = energy[pos : pos + d].mean() if d > 0 else 0.0
        pos += d

    ours = np.asarray(
        vstft.char_level_energy(jnp.asarray(energy), jnp.asarray(dur_padded), max_chars)
    )
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-4)


def test_griffin_lim_reconstructs_tone():
    """Griffin-Lim from a magnitude spectrogram must reconstruct a tone whose
    re-analyzed magnitude matches the target (legacy inverse path parity,
    reference audio/audio_processing.py:66-82)."""
    import jax

    sr, n_fft, hop = 22050, 1024, 256
    t = np.arange(4 * 1024) / sr
    sig = (0.6 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    window = jnp.asarray(vstft.hann_window(n_fft))
    mag = vstft.magnitude_spectrogram(jnp.asarray(sig), window, n_fft, hop, n_fft)

    rec = vstft.griffin_lim(mag, window, jax.random.PRNGKey(0), n_fft, hop,
                            n_fft, n_iters=40)
    rec = np.asarray(rec)
    assert rec.shape[0] >= sig.shape[0] - hop
    mag2 = vstft.magnitude_spectrogram(jnp.asarray(rec[: sig.shape[0]]),
                                       window, n_fft, hop, n_fft)
    a = np.asarray(mag)[:, 2:-2]
    b = np.asarray(mag2)[:, 2:-2]
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.15, rel


def test_reference_sample_wav_through_the_dsp_chain():
    """The reference repo's own synthesized sample (sample/tmp.wav — an
    IEEE-FLOAT wav stdlib `wave` rejects; committed DATA, not code) must
    load through data/audio_io.read_wav and pass the mel golden gate on
    real model-output audio, not just synthetic fixtures."""
    import pathlib

    p = pathlib.Path("/root/reference/sample/tmp.wav")
    if not p.exists():
        pytest.skip("reference sample not available")
    from visual_onoma_to_wave_tpu.data.audio_io import read_wav

    audio, sr = read_wav(p)
    assert sr == SR
    assert 0.4 < len(audio) / sr < 1.0
    assert np.isfinite(audio).all() and np.abs(audio).max() <= 1.0
    audio = audio.astype(np.float32)

    mag = torch_magspec(audio)
    mel_golden = np.log(np.maximum(golden_mel_fb().T @ mag, 1e-5))
    pipe = vstft.MelPipeline(SR, N_FFT, HOP, WIN, N_MELS, 0.0, 8000.0)
    logmel, _ = pipe(jnp.asarray(audio))
    assert np.abs(np.asarray(logmel) - mel_golden).mean() < 1e-3


def test_float_wav_roundtrip(tmp_path):
    """IEEE-float and extensible-PCM wavs read exactly via the RIFF
    fallback."""
    import struct

    from visual_onoma_to_wave_tpu.data.audio_io import read_wav

    x = (np.sin(np.linspace(0, 40, 1000)) * 0.7).astype(np.float32)

    def riff(tag_fields, payload, ext=False):
        fmt = struct.pack("<HHIIHH", *tag_fields)
        if ext:
            # WAVE_FORMAT_EXTENSIBLE: cbSize=22, valid bits, mask, GUID
            fmt = struct.pack("<HHIIHH", 0xFFFE, *tag_fields[1:]) + \
                struct.pack("<HHI", 22, tag_fields[5], 0) + \
                struct.pack("<H", tag_fields[0]) + b"\x00" * 14
        chunks = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                  + (b"\x00" if len(fmt) & 1 else b"")
                  + b"data" + struct.pack("<I", len(payload)) + payload)
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    f32 = tmp_path / "f32.wav"
    f32.write_bytes(riff((3, 1, 22050, 22050 * 4, 4, 32), x.tobytes()))
    y, sr = read_wav(f32)
    assert sr == 22050
    np.testing.assert_array_equal(y, x)

    ext = tmp_path / "ext.wav"
    ext.write_bytes(riff((3, 1, 16000, 16000 * 4, 4, 32), x.tobytes(),
                         ext=True))
    y2, sr2 = read_wav(ext)
    assert sr2 == 16000
    np.testing.assert_array_equal(y2, x)
