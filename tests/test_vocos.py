"""Vocos-family vocoder (models/vocos.py; beyond-reference).

Pins: output shape/finiteness, layer-norm/layer-scale structure (gamma
init), sample-exact chunked vocoding through the generic halo protocol,
vocoder-registry routing with architecture overrides, GAN-trainer
integration, and that the trunk really is mel-rate (param count has no
upsample stages).
"""
import jax
import jax.numpy as jnp
import numpy as np

from visual_onoma_to_wave_tpu.models.vocos import ConvNeXtBlock, VocosGenerator


def _tiny(**kw) -> VocosGenerator:
    kw.setdefault("dim", 16)
    kw.setdefault("intermediate_dim", 32)
    kw.setdefault("num_layers", 2)
    return VocosGenerator(**kw)


def test_generator_shape_and_finite():
    gen = _tiny()
    assert gen.total_upsample == 256
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(2, 24, 80)),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 24 * 256)
    assert np.isfinite(np.asarray(wav)).all()


def test_layer_scale_init_is_inverse_depth():
    gen = _tiny(num_layers=4)
    mel = jnp.zeros((1, 8, 80), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    g = np.asarray(params["block_0"]["gamma"])
    np.testing.assert_allclose(g, 0.25)
    # all ConvNeXt blocks present, plus embed/head/in/out norms
    assert {f"block_{i}" for i in range(4)} <= set(params)
    assert params["head_w"].shape == (16, 2 * 513)


def test_block_is_identity_at_zero_gamma():
    blk = ConvNeXtBlock(dim=8, intermediate_dim=16, layer_scale_init=0.0)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 8)),
                    jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(blk.apply(params, x)),
                               np.asarray(x))


def test_chunked_vocoding_sample_exact():
    from visual_onoma_to_wave_tpu.models.hifigan import vocoder_infer_chunked

    gen = _tiny()
    mel = jnp.asarray(np.random.default_rng(2).normal(size=(1, 70, 80)),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    full = np.asarray(gen.apply(params, mel))
    halo = gen.receptive_halo_frames()
    assert halo == 3 + 2 * 3 + 3  # embed + 2 blocks + istft head span
    chunked = np.asarray(vocoder_infer_chunked(
        params, mel, chunk_frames=32, gen=gen))
    assert chunked.shape == full.shape
    core = slice(halo * 256, -halo * 256)
    np.testing.assert_allclose(chunked[:, core], full[:, core],
                               rtol=0, atol=2e-5)


def test_registry_routing_and_overrides():
    from visual_onoma_to_wave_tpu.models.vocoder import (
        get_vocoder, vocoder_infer)

    gen = get_vocoder("Vocos", dim=16, intermediate_dim=32, num_layers=2)
    assert isinstance(gen, VocosGenerator)
    assert gen.total_upsample == 256
    default = get_vocoder("vocos")
    assert (default.dim, default.intermediate_dim, default.num_layers) == \
        (512, 1536, 8)

    mel = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16, 80)),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(1), mel)
    wavs, lens = vocoder_infer(params, mel, lengths=[10, 16], gen=gen)
    assert wavs.shape == (2, 16 * 256)
    assert list(lens) == [2560, 4096]


def test_bf16_trunk_close_to_f32():
    """Mixed-precision serving config: bf16 trunk compute (LayerNorm stats
    and the iSTFT head stay f32) must track the f32 forward to bf16
    resolution, and the GELU form flag must change the computation."""
    mel = jnp.asarray(np.random.default_rng(4).normal(-1, 1, (2, 20, 80)),
                      jnp.float32)
    g32 = _tiny()
    params = g32.init(jax.random.PRNGKey(0), mel)
    w32 = np.asarray(g32.apply(params, mel))
    w16 = np.asarray(_tiny(dtype=jnp.bfloat16).apply(params, mel))
    assert w16.dtype == np.float32  # head math is f32 regardless of trunk
    scale = max(np.abs(w32).max(), 1e-3)
    assert np.abs(w16 - w32).max() / scale < 0.1  # bf16 ~2-3 digits
    # erf vs tanh GELU: same params, close but not identical outputs
    w_erf = np.asarray(_tiny(gelu_approximate=False).apply(params, mel))
    assert np.abs(w_erf - w32).max() > 0
    assert np.abs(w_erf - w32).max() / scale < 0.05


def test_gan_training_step_updates_vocos():
    from visual_onoma_to_wave_tpu.models.hifigan_disc import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator)
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    cfg = VocoderTrainConfig(segment_size=2048, batch_size=2,
                             log_every=1000, save_every=10 ** 9)
    clips = [np.sin(np.linspace(0, 300, 6000)).astype(np.float32)]
    tr = VocoderTrainer(
        clips, cfg, gen=_tiny(), use_mesh=False,
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
