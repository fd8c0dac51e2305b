"""BigVGAN family (models/bigvgan.py) + MRD discriminator tests.

Beyond-reference vocoder family (reference vocoder slot:
scripts/utils/model.py:41-98); no published checkpoint exists in this
environment, so the pins are recipe-level: snake math, anti-aliasing
filter properties, chunked-vocoding exactness, GAN-trainer integration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_onoma_to_wave_tpu.models.bigvgan import (
    BigVGANGenerator,
    downsample2,
    kaiser_sinc_filter1d,
    snake,
    snake_beta,
    upsample2,
)

TINY = dict(upsample_initial_channel=16, n_mels=8,
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),))


def test_snake_math():
    x = jnp.linspace(-3, 3, 7)[None, :, None] * jnp.ones((1, 1, 2))
    # log_alpha = 0 -> alpha = 1: snake(x) = x + sin^2(x)
    la = jnp.zeros((2,))
    np.testing.assert_allclose(
        np.asarray(snake(x, la)),
        np.asarray(x) + np.sin(np.asarray(x)) ** 2, rtol=1e-6)
    # snakebeta with beta=alpha == snake
    np.testing.assert_allclose(np.asarray(snake_beta(x, la, la)),
                               np.asarray(snake(x, la)), rtol=1e-6)
    # periodic component: snake(x + pi) - (x + pi) == snake(x) - x
    shifted = snake(x + np.pi, la) - (x + np.pi)
    base = snake(x, la) - x
    np.testing.assert_allclose(np.asarray(shifted), np.asarray(base),
                               atol=1e-5)


def test_kaiser_filter_properties():
    h = kaiser_sinc_filter1d(0.25, 0.3, 12)
    assert h.shape == (12,)
    np.testing.assert_allclose(h.sum(), 1.0, atol=1e-5)   # unit DC gain
    np.testing.assert_allclose(h, h[::-1], atol=1e-7)      # linear phase


def test_up_down_roundtrip_bandlimited():
    """up2 -> down2 must be ~identity on a band-limited signal (error
    bounded by the K=12 filter's passband ripple) and exactly shape-
    preserving; an out-of-band signal must be attenuated by down2."""
    t = np.arange(256)
    x = (np.sin(2 * np.pi * 0.03 * t)
         + 0.5 * np.sin(2 * np.pi * 0.07 * t)).astype(np.float32)
    X = jnp.asarray(x)[None, :, None] * jnp.ones((2, 1, 3), jnp.float32)
    up = upsample2(X)
    assert up.shape == (2, 512, 3)
    dn = downsample2(up)
    assert dn.shape == (2, 256, 3)
    err = np.abs(np.asarray(dn) - np.asarray(X))[:, 10:-10].max()
    assert err < 0.01, err
    # near-Nyquist tone at the 2x rate (0.45 cycles/sample) is stopband
    hi = jnp.asarray(np.sin(2 * np.pi * 0.45 * np.arange(512))
                     .astype(np.float32))[None, :, None]
    lo = np.asarray(downsample2(hi))
    assert np.abs(lo[:, 20:-20]).max() < 0.05


@pytest.mark.parametrize("anti_aliased", [True, False])
def test_generator_shapes_and_finiteness(anti_aliased):
    gen = BigVGANGenerator(anti_aliased=anti_aliased, **TINY)
    assert gen.total_upsample == 256
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.normal(size=(2, 6, 8)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = np.asarray(gen.apply(params, mel))
    assert wav.shape == (2, 6 * 256)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0  # tanh output


def test_chunked_vocoding_sample_exact():
    """Chunked vocoding with the module's own receptive halo must equal
    the full forward away from the true signal edges (the AA resamplers'
    replicate padding differs at the edges by design)."""
    from visual_onoma_to_wave_tpu.models.hifigan import vocoder_infer_chunked

    gen = BigVGANGenerator(**TINY)
    rng = np.random.default_rng(1)
    halo = gen.receptive_halo_frames()
    T = 2 * halo + 40  # leave an interior to compare
    mel = jnp.asarray(rng.standard_normal((1, T, 8)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel)
    full = np.asarray(gen.apply(params, mel))
    chunked = np.asarray(vocoder_infer_chunked(
        params, mel, chunk_frames=32, gen=gen))
    assert chunked.shape == full.shape
    h = halo * 256
    np.testing.assert_allclose(chunked[:, h:-h], full[:, h:-h], atol=2e-5)


def test_registry():
    from visual_onoma_to_wave_tpu.models import get_vocoder

    gen = get_vocoder("BigVGAN")
    assert isinstance(gen, BigVGANGenerator)
    assert gen.upsample_initial_channel == 512
    assert gen.activation == "snakebeta" and gen.anti_aliased
    big = get_vocoder("BigVGAN-large")
    assert big.upsample_initial_channel == 1536
    assert big.total_upsample == 256
    small = get_vocoder("bigvgan", upsample_initial_channel=32)
    assert small.upsample_initial_channel == 32


def test_mrd_interface_and_gradients():
    """MRD matches the MSD (y, y_hat) interface; its eps-guarded magnitude
    keeps gradients finite even on all-zero audio (zero-padded segments)."""
    from visual_onoma_to_wave_tpu.models.hifigan_disc import (
        MultiResolutionDiscriminator, discriminator_loss)

    mrd = MultiResolutionDiscriminator(
        resolutions=((256, 64, 128), (128, 32, 64)), channels=4)
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.normal(0, 0.1, (2, 1024)), jnp.float32)
    zeros = jnp.zeros((2, 1024), jnp.float32)  # worst case: exact silence
    vars_ = mrd.init(jax.random.PRNGKey(0), y, zeros)
    rs, gs, fr, fg = mrd.apply(vars_, y, zeros)
    assert len(rs) == len(gs) == len(fr) == len(fg) == 2
    for l_ in rs + gs:
        assert l_.ndim == 2 and l_.shape[0] == 2
    # crossover symmetry (same property the MPD/MSD test pins)
    rs2, gs2, _, _ = mrd.apply(vars_, zeros, y)
    for a, b in zip(rs, gs2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(p, yh):
        r, g, _, _ = mrd.apply({"params": p}, y, yh)
        return discriminator_loss(r, g)

    grads = jax.grad(loss, argnums=(0, 1))(vars_["params"], zeros)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


def test_gan_trainer_bigvgan_mpd_mrd_step():
    """One GAN step with the BigVGAN recipe (tiny sizes): generator +
    MPD + MRD through the donated train step; finite metrics."""
    from visual_onoma_to_wave_tpu.models.hifigan_disc import (
        MultiPeriodDiscriminator, MultiResolutionDiscriminator)
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    cfg = VocoderTrainConfig(segment_size=2048, batch_size=2,
                             total_steps=1, log_every=1)
    rng = np.random.default_rng(3)
    clips = [rng.normal(0, 0.1, 4000).astype(np.float32) for _ in range(3)]
    trainer = VocoderTrainer(
        clips, cfg,
        gen=BigVGANGenerator(          # n_mels must match cfg's DSP (80)
            upsample_initial_channel=16,
            resblock_kernel_sizes=(3,), resblock_dilations=((1, 2),)),
        mpd=MultiPeriodDiscriminator(periods=(2, 3), channels=(4, 8)),
        msd=MultiResolutionDiscriminator(
            resolutions=((256, 64, 128),), channels=4),
        use_mesh=False)
    state = trainer.train(1)
    assert int(jax.device_get(state.step)) == 1
