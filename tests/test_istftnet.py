"""iSTFT-head vocoder family (models/istftnet.py; beyond-reference).

Pins: the fixed synthesis-matmul iSTFT head against a numpy irfft/window/
overlap-add reference, output lengths for both presets, sample-exact
chunked vocoding, GAN training integration (one step updates the
generator; the trainer accepts the family), and vocoder registry routing.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_onoma_to_wave_tpu.models.istftnet import (
    ISTFT_PRESETS,
    ISTFTNetGenerator,
    build_istftnet,
    istft_overlap_add,
)
from visual_onoma_to_wave_tpu.ops.stft import hann_window


def _np_istft(frames_ri: np.ndarray, n_fft: int) -> np.ndarray:
    """Reference windowed iSTFT: per-frame irfft x Hann, overlap-add at
    hop = n_fft//4, window-sum-square normalize, trim (n_fft-hop)//2."""
    b, n, _ = frames_ri.shape
    nb, hop = n_fft // 2 + 1, n_fft // 4
    w = hann_window(n_fft).astype(np.float64)
    out = np.zeros((b, (n - 1) * hop + n_fft))
    wss = np.zeros((n - 1) * hop + n_fft)
    for i in range(n):
        spec = frames_ri[:, i, :nb] + 1j * frames_ri[:, i, nb:]
        out[:, i * hop: i * hop + n_fft] += np.fft.irfft(spec, n_fft) * w
        wss[i * hop: i * hop + n_fft] += w ** 2
    out = out / np.maximum(wss, 1e-8)
    trim = (n_fft - hop) // 2
    return out[:, trim: trim + n * hop]


def test_istft_head_matches_numpy_reference():
    rng = np.random.default_rng(0)
    for n_fft, n in ((16, 40), (64, 24), (1024, 8)):
        fr = rng.standard_normal((3, n, 2 * (n_fft // 2 + 1))).astype(np.float32)
        ours = np.asarray(istft_overlap_add(jnp.asarray(fr), n_fft))
        ref = _np_istft(fr.astype(np.float64), n_fft)
        assert ours.shape == (3, n * (n_fft // 4))
        assert np.abs(ours - ref).max() < 1e-5, n_fft


def test_istft_head_precision_knob():
    """istft_overlap_add(precision=HIGH) stays within an inaudible envelope
    of the HIGHEST default (measured 1.4e-5 rel on TPU, -97 dB — below the
    16-bit quantization floor; docs/PERF.md). On CPU both run the same f32
    matmul, so this pins the API, and the envelope holds on any backend."""
    import jax

    rng = np.random.default_rng(1)
    n_fft = 256
    fr = rng.standard_normal((2, 16, 2 * (n_fft // 2 + 1))).astype(np.float32)
    hi = np.asarray(istft_overlap_add(jnp.asarray(fr), n_fft))
    fast = np.asarray(istft_overlap_add(
        jnp.asarray(fr), n_fft, precision=jax.lax.Precision.HIGH))
    scale = max(np.abs(hi).max(), 1e-6)
    assert np.abs(fast - hi).max() / scale < 1e-4


def test_istft_head_reconstructs_a_tone():
    # analysis-then-synthesis round-trip: STFT a sine with the same window/
    # hop, feed the spectra through the head, recover the interior samples
    n_fft, hop = 64, 16
    t = np.arange(4096)
    sig = (0.7 * np.sin(2 * np.pi * 0.031 * t)).astype(np.float64)
    w = hann_window(n_fft).astype(np.float64)
    n_frames = (len(sig) - n_fft) // hop + 1
    spec = np.stack([np.fft.rfft(sig[i * hop: i * hop + n_fft] * w)
                     for i in range(n_frames)])
    fr = np.concatenate([spec.real, spec.imag], axis=-1)[None].astype(np.float32)
    out = np.asarray(istft_overlap_add(jnp.asarray(fr), n_fft))[0]
    # head output frame i is centered like the analysis frames, shifted by
    # the (n_fft-hop)//2 trim; compare the interior
    start = (n_fft - hop) // 2
    ref = sig[start: start + len(out)]
    assert np.abs(out[n_fft:-n_fft] - ref[n_fft:-n_fft]).max() < 1e-4


def _tiny(preset: str) -> ISTFTNetGenerator:
    return build_istftnet(preset, upsample_initial_channel=16,
                          resblock_kernel_sizes=(3,),
                          resblock_dilations=((1, 2),))


def test_generator_shapes_both_presets():
    rng = jax.random.PRNGKey(0)
    mel = jnp.asarray(np.random.default_rng(1).normal(size=(2, 24, 80)),
                      jnp.float32)
    for preset in ISTFT_PRESETS:
        gen = _tiny(preset)
        assert gen.total_upsample == 256
        params = gen.init(rng, mel)
        wav = gen.apply(params, mel)
        assert wav.shape == (2, 24 * 256)
        assert np.isfinite(np.asarray(wav)).all()


@pytest.mark.parametrize("preset", list(ISTFT_PRESETS))
def test_chunked_vocoding_sample_exact(preset):
    # both presets: melrate takes the distinct no-upsample halo branch of
    # receptive_halo_frames (istftnet.py), used by the committed demo ckpt
    from visual_onoma_to_wave_tpu.models.hifigan import vocoder_infer_chunked

    gen = _tiny(preset)
    mel = jnp.asarray(np.random.default_rng(2).normal(size=(1, 70, 80)),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    full = np.asarray(gen.apply(params, mel))
    halo = gen.receptive_halo_frames()
    chunked = np.asarray(vocoder_infer_chunked(
        params, mel, chunk_frames=32, gen=gen))
    assert chunked.shape == full.shape
    # exact away from the true sequence edges (the chunk windows see zero
    # padding there, the full forward sees the conv zero padding -- same
    # values; edges differ only through the wss edge taper, also shared)
    core = slice(halo * 256, -halo * 256)
    np.testing.assert_allclose(chunked[:, core], full[:, core],
                               rtol=0, atol=2e-5)


def test_registry_and_vocoder_infer_routing():
    from visual_onoma_to_wave_tpu.models.vocoder import (
        get_vocoder, vocoder_infer)

    gen = get_vocoder("iSTFTNet", upsample_initial_channel=16,
                      resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),))
    assert isinstance(gen, ISTFTNetGenerator)
    assert gen.istft_n_fft == 16
    gen_mel = get_vocoder("iSTFTNet-mel")
    assert gen_mel.upsample_rates == () and gen_mel.istft_n_fft == 1024

    mel = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16, 80)),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(1), mel)
    wavs, lens = vocoder_infer(params, mel, lengths=[10, 16], gen=gen)
    assert wavs.shape == (2, 16 * 256)
    assert list(lens) == [2560, 4096]


def test_gan_training_step_updates_istftnet():
    from visual_onoma_to_wave_tpu.models.hifigan_disc import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator)
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    cfg = VocoderTrainConfig(segment_size=2048, batch_size=2,
                             log_every=1000, save_every=10 ** 9)
    clips = [np.sin(np.linspace(0, 300, 6000)).astype(np.float32)]
    tr = VocoderTrainer(
        clips, cfg, gen=_tiny("c8c8i"), use_mesh=False,
        mpd=MultiPeriodDiscriminator(periods=(2, 3), channels=(4, 8)),
        msd=MultiScaleDiscriminator(n_scales=2, channels=4))
    before = jax.tree.map(np.asarray, tr.state.gen_params)
    audio = tr.sampler.next_batch()
    state, metrics = tr.train_step(tr.state, jnp.asarray(audio))
    assert np.isfinite(float(metrics["g_total"]))
    assert np.isfinite(float(metrics["d_total"]))
    changed = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - b).max()) > 0,
        state.gen_params, before)
    assert all(jax.tree.leaves(changed))


def test_trainer_rejects_wrong_total_upsample():
    import pytest

    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    bad = build_istftnet("c8c8i", upsample_rates=(4, 8),
                         upsample_kernel_sizes=(8, 16),
                         upsample_initial_channel=16,
                         resblock_kernel_sizes=(3,),
                         resblock_dilations=((1, 2),))
    assert bad.total_upsample == 128
    with pytest.raises(ValueError, match="128"):
        VocoderTrainer([np.zeros(4096, np.float32)],
                       VocoderTrainConfig(segment_size=2048, batch_size=1),
                       gen=bad, use_mesh=False)
