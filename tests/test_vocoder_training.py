"""HiFi-GAN vocoder GAN training (beyond-reference extension).

Covers: discriminator shapes/feature maps, loss properties, one donated
GAN step updating every parameter group, a short overfit run driving mel
L1 down, and that a trained generator plugs into vocoder_infer.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator, vocoder_infer
from visual_onoma_to_wave_tpu.models.hifigan_disc import (
    MultiPeriodDiscriminator, MultiScaleDiscriminator, _avg_pool1d,
    discriminator_loss, feature_matching_loss, generator_adversarial_loss)
from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
    SegmentSampler, VocoderTrainConfig, VocoderTrainer)

TINY_MPD = dict(periods=(2, 3), channels=(4, 8))
TINY_MSD = dict(n_scales=2, channels=4)


def _tiny_gen():
    return HiFiGANGenerator(
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 2),))


def _tiny_cfg(**kw):
    kw.setdefault("segment_size", 2048)
    kw.setdefault("batch_size", 2)
    kw.setdefault("log_every", 1000)
    kw.setdefault("save_every", 10**9)
    return VocoderTrainConfig(**kw)


def test_mpd_shapes_and_period_view():
    mpd = MultiPeriodDiscriminator(**TINY_MPD)
    y = jnp.asarray(np.random.default_rng(0).normal(0, 0.1, (2, 2048)),
                    jnp.float32)
    vars_ = mpd.init(jax.random.PRNGKey(0), y, y)
    rs, gs, fr, fg = mpd.apply(vars_, y, y + 0.1)
    assert len(rs) == len(gs) == len(fr) == len(fg) == 2
    for lr, mr in zip(rs, fr):
        assert lr.ndim == 2 and lr.shape[0] == 2
        # channels stack + pre-post conv + logits layer
        assert len(mr) == len(TINY_MPD["channels"]) + 2
    # identical inputs -> identical scores
    rs2, gs2, _, _ = mpd.apply(vars_, y, y)
    for a, b in zip(rs2, gs2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_msd_shapes_and_pooling():
    msd = MultiScaleDiscriminator(**TINY_MSD)
    y = jnp.asarray(np.random.default_rng(1).normal(0, 0.1, (2, 2048)),
                    jnp.float32)
    vars_ = msd.init(jax.random.PRNGKey(0), y, y)
    rs, gs, fr, fg = msd.apply(vars_, y, y)
    assert len(rs) == TINY_MSD["n_scales"]
    assert all(len(m) == 8 for m in fr)  # 7 conv layers + logits
    # torch AvgPool1d(4,2,2) length semantics: (T + 2*2 - 4)//2 + 1
    assert _avg_pool1d(y).shape == (2, (2048 + 4 - 4) // 2 + 1)


def test_discriminator_symmetry_and_solo_oracle():
    """Property pin for any MPD/MSD batching formulation: scoring
    (y, y_hat) vs the swapped (y_hat, y) must cross over exactly, and the
    2B chain's real half must equal driving one sub-discriminator solo.
    (A 2B-concat formulation passed this test but measured SLOWER on v5e
    — 117.8 vs 110.4 ms/GAN-step same-session; see docs/PERF.md 'dead
    ends'. The test stays: it pins whatever formulation is in use.)"""
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(0, 0.1, (2, 2048)), jnp.float32)
    yh = jnp.asarray(rng.normal(0, 0.1, (2, 2048)), jnp.float32)
    for mod in (MultiPeriodDiscriminator(**TINY_MPD),
                MultiScaleDiscriminator(**TINY_MSD)):
        vars_ = mod.init(jax.random.PRNGKey(0), y, yh)
        rs, gs, fr, fg = mod.apply(vars_, y, yh)
        rs2, gs2, fr2, fg2 = mod.apply(vars_, yh, y)
        for a, b in zip(rs, gs2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(gs, rs2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for ma, mb in zip(fr, fg2):
            for a, b in zip(ma, mb):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # true single-batch oracle: drive one sub-discriminator directly on y
    # alone with the same params; the 2B chain's real half must match
    from visual_onoma_to_wave_tpu.models.hifigan_disc import (
        PeriodDiscriminator, ScaleDiscriminator)
    mpd = MultiPeriodDiscriminator(**TINY_MPD)
    vars_ = mpd.init(jax.random.PRNGKey(1), y, yh)
    rs, _, fr, _ = mpd.apply(vars_, y, yh)
    solo, solo_f = PeriodDiscriminator(
        TINY_MPD["periods"][0], TINY_MPD["channels"]).apply(
        {"params": vars_["params"]["p2"]}, y)
    np.testing.assert_allclose(np.asarray(rs[0]), np.asarray(solo),
                               rtol=0, atol=1e-6)
    msd = MultiScaleDiscriminator(**TINY_MSD)
    vars_ = msd.init(jax.random.PRNGKey(2), y, yh)
    rs, _, _, _ = msd.apply(vars_, y, yh)
    solo, _ = ScaleDiscriminator(TINY_MSD["channels"]).apply(
        {"params": vars_["params"]["s0"]}, y)
    np.testing.assert_allclose(np.asarray(rs[0]), np.asarray(solo),
                               rtol=0, atol=1e-6)


def test_loss_properties():
    # perfect discrimination (Dr=1, Dg=0) => zero loss; worst case grows
    one, zero = [jnp.ones((2, 5))], [jnp.zeros((2, 5))]
    assert float(discriminator_loss(one, zero)) == 0.0
    assert float(generator_adversarial_loss(one)) == 0.0
    assert float(discriminator_loss(zero, one)) == pytest.approx(2.0)
    fm = feature_matching_loss([[jnp.ones((2, 3))]], [[jnp.zeros((2, 3))]])
    assert float(fm) == pytest.approx(2.0)


def test_sampler_shapes_and_padding():
    cfg = _tiny_cfg()
    clips = [np.ones(5000, np.float32), np.full(100, 0.5, np.float32)]
    s = SegmentSampler(clips, cfg)
    batch = s.next_batch()
    assert batch.shape == (2, 2048)
    # short clip gets zero-padded, long clip fills the segment
    for row in batch:
        assert set(np.unique(row)) <= {0.0, 0.5, 1.0}


def test_grad_clip_norm_is_wired_and_trains():
    """cfg.grad_clip_norm > 0 must insert a clip stage ahead of Adam in
    BOTH optimizers (the BigVGAN recipe depends on it — at the flat
    HiFi-GAN lr the family diverges to tanh rails, docs/PERF.md) and the
    clipped step must stay finite and move every param group."""
    rng = np.random.default_rng(3)
    clip = rng.normal(0, 0.2, 6000).astype(np.float32)
    cfg = _tiny_cfg(learning_rate=1e-4, grad_clip_norm=1e3)
    trainer = VocoderTrainer(
        [clip], cfg, gen=_tiny_gen(), use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    # optax.chain(clip_by_global_norm, adamw) => 2-stage outer state whose
    # first element is the (stateless) clip stage
    assert len(trainer.state.gen_opt) == 2
    assert len(trainer.state.disc_opt) == 2
    p0 = jax.device_get(trainer.state.gen_params)
    audio = jnp.asarray(trainer.sampler.next_batch())
    state1, m1 = trainer.train_step(trainer.state, audio)
    for k in ("d_total", "g_total", "mel_l1"):
        assert np.isfinite(float(m1[k])), k
    p1 = jax.device_get(state1.gen_params)
    assert any(np.abs(a - b).max() > 0 for a, b in
               zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))


def test_gan_step_updates_everything_and_overfits():
    rng = np.random.default_rng(2)
    t = np.arange(6000) / 22050.0
    clip = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    cfg = _tiny_cfg(learning_rate=5e-4)
    trainer = VocoderTrainer(
        [clip], cfg, gen=_tiny_gen(), use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))

    p0 = jax.device_get(trainer.state.gen_params)
    d0 = jax.device_get(trainer.state.mpd_params)
    audio = jnp.asarray(trainer.sampler.next_batch())
    state1, m1 = trainer.train_step(trainer.state, audio)
    assert int(state1.step) == 1
    for k in ("d_total", "d_mpd", "d_msd", "g_adv", "g_fm", "mel_l1",
              "g_total"):
        assert np.isfinite(float(m1[k])), k
    # every group actually moved
    p1 = jax.device_get(state1.gen_params)
    d1 = jax.device_get(state1.mpd_params)
    assert any(np.abs(a - b).max() > 0 for a, b in
               zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))
    assert any(np.abs(a - b).max() > 0 for a, b in
               zip(jax.tree.leaves(d0), jax.tree.leaves(d1)))

    trainer.state = state1
    first = float(m1["mel_l1"])
    state = trainer.train(steps=30)
    # the short run must reduce the reconstruction loss (train_step donates
    # its input state, so keep working from the returned one)
    audio = jnp.asarray(trainer.sampler.next_batch())
    state, m = trainer.train_step(state, audio)
    assert float(m["mel_l1"]) < first

    # the trained generator pytree drives the standard inference path
    mel = jnp.zeros((1, 8, 80), jnp.float32)
    wavs, lens = vocoder_infer(jax.device_get(state.gen_params), mel,
                               gen=_tiny_gen())
    assert wavs.shape == (1, 8 * 256) and int(lens[0]) == 8 * 256


def test_checkpoint_roundtrip_feeds_inference(tmp_path):
    from visual_onoma_to_wave_tpu.utils.checkpoint import load_params

    clip = np.zeros(4000, np.float32)
    trainer = VocoderTrainer(
        [clip], _tiny_cfg(), gen=_tiny_gen(), ckpt_dir=tmp_path,
        use_mesh=False, mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    trainer.save(7)
    params = load_params(tmp_path / "7" / "generator")
    a = jax.tree.leaves(jax.device_get(trainer.state.gen_params))
    b = jax.tree.leaves(params)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
    wavs, _ = vocoder_infer(params, jnp.zeros((1, 4, 80)), gen=_tiny_gen())
    assert wavs.shape == (1, 4 * 256)
    full = load_params(tmp_path / "7" / "full_state")
    assert {"gen_params", "mpd_params", "msd_params", "gen_opt",
            "disc_opt", "step"} <= set(full)


def test_gan_step_data_parallel_equals_single_device():
    """Same batch, same init: GAN losses after 2 steps match between a
    1-device run and an 8-device sharded run (the step has no in-jit RNG,
    so DP must be exactly loss-equivalent; same pattern as the acoustic
    trainer's test_data_parallel_equals_single_device)."""
    from visual_onoma_to_wave_tpu.parallel.mesh import get_mesh, batch_sharding

    rng = np.random.default_rng(5)
    clip = rng.normal(0, 0.2, 9000).astype(np.float32)
    cfg = _tiny_cfg(batch_size=8)

    def fresh():
        return VocoderTrainer(
            [clip], cfg, gen=_tiny_gen(), use_mesh=False,
            mpd=MultiPeriodDiscriminator(**TINY_MPD),
            msd=MultiScaleDiscriminator(**TINY_MSD))

    t1 = fresh()
    batch = t1.sampler.next_batch()
    s1, m1 = t1.train_step(t1.state, jnp.asarray(batch))
    s1, m1 = t1.train_step(s1, jnp.asarray(batch))

    mesh = get_mesh(8)
    assert mesh.size == 8
    t8 = fresh()
    sharded = jax.device_put(jnp.asarray(batch), batch_sharding(mesh))
    s8, m8 = t8.train_step(t8.state, sharded)
    s8, m8 = t8.train_step(s8, sharded)

    for k in ("g_total", "d_total", "mel_l1"):
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=1e-4)
    a = jax.tree.leaves(jax.device_get(s1.gen_params))[0]
    b = jax.tree.leaves(jax.device_get(s8.gen_params))[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=1e-6)


def test_resume_restores_full_state(tmp_path):
    rng = np.random.default_rng(3)
    clip = rng.normal(0, 0.2, 8000).astype(np.float32)

    def fresh():
        return VocoderTrainer(
            [clip], _tiny_cfg(), gen=_tiny_gen(), ckpt_dir=tmp_path,
            use_mesh=False, mpd=MultiPeriodDiscriminator(**TINY_MPD),
            msd=MultiScaleDiscriminator(**TINY_MSD))

    t1 = fresh()
    t1.train(steps=3)
    t1.save(3)
    ref = jax.device_get(t1.state)

    t2 = fresh()
    assert t2.restore() == 3           # latest
    got = jax.device_get(t2.state)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_array_equal(a, b)
    # the sampler RNG stream position is restored too: the resumed trainer
    # must see the batch an uninterrupted run would draw next, not a replay
    # of the seed-initial stream
    np.testing.assert_array_equal(t2.sampler.next_batch(),
                                  t1.sampler.next_batch())
    # total-step semantics: continues from 3, not from 0
    t2.train(steps=4)
    assert int(jax.device_get(t2.state.step)) == 4

    with pytest.raises(FileNotFoundError):
        VocoderTrainer([clip], _tiny_cfg(), gen=_tiny_gen(),
                       ckpt_dir=tmp_path / "empty", use_mesh=False,
                       mpd=MultiPeriodDiscriminator(**TINY_MPD),
                       msd=MultiScaleDiscriminator(**TINY_MSD)).restore()


def test_finetune_on_paired_mels():
    """Fine-tuning mode: the generator input is an external (predicted)
    mel while the mel-L1 target comes from the real audio."""
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        PairedSegmentSampler)

    rng = np.random.default_rng(4)
    cfg = _tiny_cfg()
    hop, t_seg = cfg.hop_length, cfg.segment_size // cfg.hop_length
    # 40-frame clip + deliberately-offset "predicted" mel
    audio = rng.normal(0, 0.3, 40 * hop).astype(np.float32)
    mel = rng.normal(-3, 1, (40, cfg.n_mels)).astype(np.float32)
    sampler = PairedSegmentSampler([(audio, mel)], cfg)
    a, m = sampler.next_batch()
    assert a.shape == (cfg.batch_size, cfg.segment_size)
    assert m.shape == (cfg.batch_size, cfg.n_mels, t_seg)

    # alignment: the mel segment rows must be rows of the source mel
    col = m[0].T  # (t_seg, n_mels)
    src = {tuple(np.round(r, 5)) for r in mel}
    assert all(tuple(np.round(r, 5)) in src for r in col)

    trainer = VocoderTrainer(
        None, cfg, gen=_tiny_gen(), use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD), pairs=[(audio, mel)])
    state = trainer.train(steps=2)
    assert int(jax.device_get(state.step)) == 2

    # explicit-mel step == implicit step when mel is the audio's own
    t2 = VocoderTrainer(
        [audio], cfg, gen=_tiny_gen(), use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    batch = t2.sampler.next_batch()
    from visual_onoma_to_wave_tpu.ops.stft import (
        hann_window, logmel_and_energy, melscale_fbanks)
    w = jnp.asarray(hann_window(cfg.win_length))
    fb = jnp.asarray(melscale_fbanks(cfg.n_fft // 2 + 1, cfg.f_min,
                                     cfg.f_max, cfg.n_mels,
                                     cfg.sampling_rate))
    own_mel, _ = logmel_and_energy(jnp.asarray(batch), w, fb, cfg.n_fft,
                                   cfg.hop_length, cfg.win_length)
    own_mel = own_mel[..., :t_seg]
    sa, ma = t2.train_step(t2.state, jnp.asarray(batch))
    t3 = VocoderTrainer(
        [audio], cfg, gen=_tiny_gen(), use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    sb, mb = t3.train_step(t3.state, jnp.asarray(batch), own_mel)
    np.testing.assert_allclose(float(ma["g_total"]), float(mb["g_total"]),
                               rtol=1e-5)


@pytest.fixture(scope="module")
def finetune_env(tmp_path_factory):
    """Synthetic corpus preprocessed with save_audio=True + a tiny acoustic
    Trainer over it (the full fine-tuning data path)."""
    import test_pipeline_e2e as pe
    from visual_onoma_to_wave_tpu.data.preprocess import Preprocessor
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    # build the same synthetic corpus as the pipeline e2e tests
    cfg = pe.corpus.__wrapped__(tmp_path_factory)
    pre = Preprocessor(cfg, save_audio=True)
    pre.build(verbose=False)
    out = tmp_path_factory.mktemp("ft_out")
    cfg = cfg.replace(
        path=cfg.path.__class__(
            corpus=cfg.path.corpus, formatted=cfg.path.formatted,
            preprocessed=cfg.path.preprocessed, ckpt=str(out / "ckpt"),
            log=str(out / "log"), result=str(out / "result"), font=""),
        model=cfg.model.__class__(
            transformer=cfg.model.transformer.__class__(
                encoder_layer=1, decoder_layer=1, encoder_hidden=32,
                decoder_hidden=32, conv_filter_size=64,
                conv_kernel_size=(3, 1)),
            visual_feature_extractor=cfg.model.visual_feature_extractor.__class__(
                layer_num=1),
            max_seq_len=256),
        train=cfg.train.__class__(
            optimizer=cfg.train.optimizer.__class__(batch_size=2,
                                                    warm_up_step=10),
            step=cfg.train.step.__class__(
                total_step=2, log_step=10, synth_step=100, val_step=100,
                save_step=100),
            max_mel_len=256, seed=0))
    trainer = Trainer(cfg, use_mesh=False)
    yield cfg, trainer
    trainer.ckpt.close()


def test_teacher_forced_pairs_and_finetune(finetune_env):
    """End-to-end fine-tuning data path: preprocess(save_audio) ->
    teacher-forced acoustic mels -> paired vocoder fine-tune step."""
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        teacher_forced_pairs)

    cfg, trainer = finetune_env
    pairs = teacher_forced_pairs(trainer)
    assert pairs, "no pairs exported"
    hop = cfg.audio.stft.hop_length
    for a, m in pairs:
        assert len(a) == m.shape[0] * hop     # frame-aligned by design
        assert m.shape[1] == cfg.audio.mel.n_mel_channels
        assert np.isfinite(m).all() and np.isfinite(a).all()
    # augmented rows have no saved audio and must have been skipped
    assert len(pairs) <= len(trainer.train_ds.rows)

    vt = VocoderTrainer(
        None, _tiny_cfg(), gen=_tiny_gen(), use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD), pairs=pairs)
    state = vt.train(steps=1)
    assert int(jax.device_get(state.step)) == 1


def test_rejects_hop_mismatch():
    gen = HiFiGANGenerator(upsample_rates=(8, 8, 2),
                           upsample_kernel_sizes=(16, 16, 4),
                           upsample_initial_channel=16,
                           resblock_kernel_sizes=(3,),
                           resblock_dilations=((1,),))
    with pytest.raises(ValueError):
        VocoderTrainer([np.zeros(4000, np.float32)], _tiny_cfg(), gen=gen,
                       use_mesh=False,
                       mpd=MultiPeriodDiscriminator(**TINY_MPD),
                       msd=MultiScaleDiscriminator(**TINY_MSD))


def test_single_forward_vjp_step_matches_recompute_formulation():
    """The production step runs the generator ONCE (saved jax.vjp closed by
    the G update). Pin it numerically against the straightforward
    two-forward formulation (recompute y_hat inside the G loss): gen_params
    are untouched by the D update, so the two must agree to float tolerance
    on every updated parameter group."""
    import optax
    from visual_onoma_to_wave_tpu.ops.stft import (
        hann_window, logmel_and_energy, melscale_fbanks)
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        make_gan_train_step)

    cfg = _tiny_cfg(learning_rate=5e-4)
    gen = _tiny_gen()
    mpd = MultiPeriodDiscriminator(**TINY_MPD)
    msd = MultiScaleDiscriminator(**TINY_MSD)
    rng = np.random.default_rng(7)
    audio = jnp.asarray(
        rng.normal(0, 0.3, (cfg.batch_size, cfg.segment_size)), jnp.float32)

    def init_state():
        from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
            GANTrainState)
        k = jax.random.PRNGKey(0)
        gp = gen.init(k, jnp.zeros((1, 8, cfg.n_mels), jnp.float32))
        y0 = jnp.zeros((1, cfg.segment_size), jnp.float32)
        mp = mpd.init(k, y0, y0)["params"]
        sp = msd.init(k, y0, y0)["params"]
        gtx = optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
        dtx = optax.adam(cfg.learning_rate, b1=cfg.adam_b1, b2=cfg.adam_b2)
        return GANTrainState(
            step=jnp.zeros((), jnp.int32), gen_params=gp, mpd_params=mp,
            msd_params=sp, gen_opt=gtx.init(gp), disc_opt=dtx.init((mp, sp)),
        ), gtx, dtx

    # production step (single forward + vjp)
    state_a, gtx, dtx = init_state()
    step = make_gan_train_step(gen, mpd, msd, gtx, dtx, cfg)
    new_a, metrics_a = step(state_a, audio)

    # reference formulation: recompute the forward inside the G loss
    window = jnp.asarray(hann_window(cfg.win_length))
    fb = jnp.asarray(melscale_fbanks(cfg.n_fft // 2 + 1, cfg.f_min,
                                     cfg.f_max, cfg.n_mels,
                                     cfg.sampling_rate))
    t_mel = cfg.segment_size // cfg.hop_length

    def mel_of(a):
        lm, _ = logmel_and_energy(a, window, fb, cfg.n_fft, cfg.hop_length,
                                  cfg.win_length)
        return lm[..., :t_mel]

    def recompute_step(state, audio):
        mel_target = mel_of(audio)
        y_hat = gen.apply(state.gen_params, mel_target.swapaxes(1, 2))
        y_sg = jax.lax.stop_gradient(y_hat)

        def d_loss(dp):
            mp_, sp_ = dp
            pr, pg, _, _ = mpd.apply({"params": mp_}, audio, y_sg)
            sr, sg_, _, _ = msd.apply({"params": sp_}, audio, y_sg)
            return discriminator_loss(pr, pg) + discriminator_loss(sr, sg_)

        d_grads = jax.grad(d_loss)((state.mpd_params, state.msd_params))
        d_up, disc_opt = dtx.update(d_grads, state.disc_opt,
                                    (state.mpd_params, state.msd_params))
        mp2, sp2 = optax.apply_updates(
            (state.mpd_params, state.msd_params), d_up)

        def g_loss(gp):
            yh = gen.apply(gp, mel_target.swapaxes(1, 2))
            mel_l1 = jnp.mean(jnp.abs(mel_of(yh) - mel_target))
            pr, pg, fpr, fpg = mpd.apply({"params": mp2}, audio, yh)
            sr, sg_, fsr, fsg = msd.apply({"params": sp2}, audio, yh)
            adv = (generator_adversarial_loss(pg)
                   + generator_adversarial_loss(sg_))
            fm = (feature_matching_loss(fpr, fpg)
                  + feature_matching_loss(fsr, fsg))
            return adv + fm + cfg.mel_loss_weight * mel_l1

        g_grads = jax.grad(g_loss)(state.gen_params)
        g_up, _ = gtx.update(g_grads, state.gen_opt, state.gen_params)
        return optax.apply_updates(state.gen_params, g_up), (mp2, sp2)

    state_b, _, _ = init_state()
    gen_b, (mpd_b, msd_b) = jax.jit(recompute_step)(state_b, audio)

    for a, b in zip(jax.tree.leaves(jax.device_get(new_a.gen_params)),
                    jax.tree.leaves(jax.device_get(gen_b))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(new_a.mpd_params)),
                    jax.tree.leaves(jax.device_get(mpd_b))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(jax.device_get(new_a.msd_params)),
                    jax.tree.leaves(jax.device_get(msd_b))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
    assert np.isfinite(float(metrics_a["g_total"]))


def test_bf16_mixed_precision_step_trains():
    """compute_dtype="bfloat16": convs compute at bf16 but params, losses
    and the mel DSP stay f32 — one step runs finite, every param group
    (still f32) moves, and a short run reduces mel L1 like the f32 path
    (the on-chip full-size convergence validation is in docs/PERF.md)."""
    rng = np.random.default_rng(5)
    t = np.arange(6000) / 22050.0
    clip = (0.5 * np.sin(2 * np.pi * 220 * t)
            + rng.normal(0, 0.05, 6000)).astype(np.float32)
    cfg = _tiny_cfg(learning_rate=5e-4, compute_dtype="bfloat16")
    gen = HiFiGANGenerator(
        upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 2),), dtype=jnp.bfloat16)
    trainer = VocoderTrainer(
        [clip], cfg, gen=gen, use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD, dtype=jnp.bfloat16),
        msd=MultiScaleDiscriminator(**TINY_MSD, dtype=jnp.bfloat16))

    for leaf in jax.tree.leaves(trainer.state.gen_params):
        assert leaf.dtype == jnp.float32  # master params stay f32
    p0 = jax.device_get(trainer.state.gen_params)
    audio = jnp.asarray(trainer.sampler.next_batch())
    state1, m1 = trainer.train_step(trainer.state, audio)
    for k in ("d_total", "g_adv", "g_fm", "mel_l1", "g_total"):
        assert np.isfinite(float(m1[k])), k
    p1 = jax.device_get(state1.gen_params)
    assert any(np.abs(a - b).max() > 0 for a, b in
               zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))
    for leaf in jax.tree.leaves(state1.gen_params):
        assert leaf.dtype == jnp.float32

    trainer.state = state1
    first = float(m1["mel_l1"])
    state = trainer.train(steps=30)
    audio = jnp.asarray(trainer.sampler.next_batch())
    _, m = trainer.train_step(state, audio)
    assert float(m["mel_l1"]) < first


def test_default_trainer_modules_pick_up_compute_dtype():
    cfg = _tiny_cfg(compute_dtype="bfloat16")
    trainer = VocoderTrainer([np.zeros(4096, np.float32)], cfg,
                             use_mesh=False)
    assert trainer.gen.dtype == jnp.bfloat16
    assert trainer.mpd.dtype == jnp.bfloat16
    assert trainer.msd.dtype == jnp.bfloat16


def test_ema_tracks_generator_and_checkpoints(tmp_path):
    """cfg.ema_decay > 0: gen_ema follows the exact EMA recursion over the
    post-update params, saves as a loadable generator_ema artifact, and
    survives a full-state resume bit-exactly."""
    t = np.arange(6000) / 22050.0
    clip = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    cfg = _tiny_cfg(learning_rate=5e-4, ema_decay=0.5)
    trainer = VocoderTrainer(
        [clip], cfg, gen=_tiny_gen(), use_mesh=False, ckpt_dir=tmp_path,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))

    # manual recomputation of the recursion, seeded at the init point
    ema = jax.device_get(trainer.state.gen_params)
    state = trainer.state
    for _ in range(3):
        audio = jnp.asarray(trainer.sampler.next_batch())
        state, _ = trainer.train_step(state, audio)
        p = jax.device_get(state.gen_params)
        ema = jax.tree.map(lambda e, q: 0.5 * e + 0.5 * q, ema, p)
    got = jax.device_get(state.gen_ema)
    for a, b in zip(jax.tree.leaves(ema), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7)
    # the average genuinely differs from the raw iterate
    assert any(np.abs(a - b).max() > 1e-8 for a, b in
               zip(jax.tree.leaves(got),
                   jax.tree.leaves(jax.device_get(state.gen_params))))

    # generator_ema is a serving artifact: saved next to generator and
    # loadable straight into vocoder_infer
    trainer.state = state
    trainer.save(3)
    from visual_onoma_to_wave_tpu.utils.checkpoint import load_params
    ema_params = load_params(tmp_path / "3" / "generator_ema")
    wavs, _ = vocoder_infer(ema_params, jnp.zeros((1, 4, 80)),
                            gen=_tiny_gen())
    assert wavs.shape == (1, 4 * 256)

    # exact resume of the EMA stream
    t2 = VocoderTrainer(
        [clip], cfg, gen=_tiny_gen(), use_mesh=False, ckpt_dir=tmp_path,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    assert t2.restore(3) == 3
    for a, b in zip(jax.tree.leaves(jax.device_get(t2.state.gen_ema)),
                    jax.tree.leaves(got)):
        np.testing.assert_array_equal(a, b)


def test_ema_off_is_the_official_recipe(tmp_path):
    """Default ema_decay=0.0 keeps gen_ema=None end to end and writes no
    generator_ema artifact (checkpoint layout identical to before)."""
    trainer = VocoderTrainer(
        [np.zeros(4096, np.float32)], _tiny_cfg(), gen=_tiny_gen(),
        use_mesh=False, ckpt_dir=tmp_path,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    assert trainer.state.gen_ema is None
    audio = jnp.asarray(trainer.sampler.next_batch())
    state1, _ = trainer.train_step(trainer.state, audio)
    assert state1.gen_ema is None
    trainer.state = state1
    trainer.save(1)
    assert (tmp_path / "1" / "generator").exists()
    assert not (tmp_path / "1" / "generator_ema").exists()


def test_resblock2_family_trains():
    """A HiFi-GAN V3-style (ResBlock2) generator plugs into the GAN trainer
    unchanged (hop-matched 8*8*4 upsampling)."""
    gen = HiFiGANGenerator(
        upsample_rates=(8, 8, 4), upsample_kernel_sizes=(16, 16, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilations=((1, 2),), resblock_type="2")
    t = np.arange(6000) / 22050.0
    clip = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    trainer = VocoderTrainer(
        [clip], _tiny_cfg(learning_rate=5e-4), gen=gen, use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    p0 = jax.device_get(trainer.state.gen_params)
    audio = jnp.asarray(trainer.sampler.next_batch())
    state1, m = trainer.train_step(trainer.state, audio)
    assert all(np.isfinite(float(v)) for v in m.values())
    p1 = jax.device_get(state1.gen_params)
    assert any(np.abs(a - b).max() > 0 for a, b in
               zip(jax.tree.leaves(p0), jax.tree.leaves(p1)))


class _WatchdogProbe:
    """Minimal stand-in carrying only the watchdog state — exercises
    VocoderTrainer._check_divergence without building models."""

    def __init__(self, factor=4.0, patience=5, ceiling=1.5, warmup=10,
                 frozen_patience=3):
        self.cfg = VocoderTrainConfig(
            divergence_factor=factor, divergence_patience=patience,
            divergence_mel_ceiling=ceiling,
            divergence_warmup_windows=warmup,
            frozen_patience=frozen_patience)
        self.diverged_at = None
        self._best_mel_l1 = float("inf")
        self._bad_windows = 0
        self._windows_seen = 0
        self._last_mel = None
        self._frozen_windows = 0

    def feed(self, step, mel_l1, g=1.0, d=1.0):
        m = {"mel_l1": mel_l1, "g_total": g, "d_total": d}
        return VocoderTrainer._check_divergence(self, step, m)


def test_divergence_watchdog_state_machine():
    """The watchdog fires on the measured collapse signature (mel_l1 stuck
    at ~8-10x the running best, BASELINE.md 20k arms) exactly once, after
    the configured patience, and never on healthy GAN noise."""
    # healthy run: HiFi-GAN V2's worst measured window-to-window noise is
    # ~2x best (0.30 -> 0.62) — must NOT trigger
    w = _WatchdogProbe()
    healthy = [0.62, 0.44, 0.60, 0.43, 0.58, 0.52, 0.37, 0.40, 0.32,
               0.31, 0.30, 0.39, 0.45, 0.41, 0.44, 0.62, 0.61, 0.60]
    assert not any(w.feed(100 * (i + 1), v) for i, v in enumerate(healthy))
    assert w.diverged_at is None

    # collapse: istftnet-mel's measured trajectory shape — converge to
    # ~0.18, explode to ~2.2 and stay there
    w = _WatchdogProbe(patience=3)
    seq = [0.62, 0.31, 0.25, 0.24, 0.18, 2.19, 2.43, 2.04]
    fired = [w.feed(100 * (i + 1), v) for i, v in enumerate(seq)]
    # windows 6,7,8 are the 3 consecutive bad ones -> fires at the 8th
    assert fired == [False] * 7 + [True]
    assert w.diverged_at == 800
    # a later window must not re-fire (warn-once semantics)
    assert w.feed(900, 2.5) is False

    # one-window recovery resets patience (transient spike, not collapse)
    w = _WatchdogProbe(patience=2)
    assert not any(w.feed(s, v) for s, v in
                   [(100, 0.2), (200, 1.5), (300, 0.21), (400, 1.5)])
    assert w._bad_windows == 1

    # non-finite losses trigger immediately regardless of patience
    w = _WatchdogProbe(patience=5)
    assert w.feed(100, 0.2) is False
    assert w.feed(200, float("nan")) is True
    assert w.diverged_at == 200
    w = _WatchdogProbe(patience=5)
    assert w.feed(100, 0.2) is False
    assert w.feed(200, 0.2, g=float("inf")) is True


def test_divergence_watchdog_early_collapse_ceiling():
    """EARLY collapse (ADVICE r04): a run that rails out BEFORE mel_l1
    ever converges (BigVGAN flat-recipe signature: finite losses pinned
    at mel L1 ~2.0-2.2 from ~1k steps) sets marginal 'bests' at the
    collapsed level too rarely for factor-over-best to fire. Past the
    warmup, NON-improving windows above the absolute ceiling count as
    bad; new-best windows reset the streak so a corpus legitimately
    descending through (or noisily plateaued above) the bench-calibrated
    1.5 is not killed."""
    w = _WatchdogProbe(patience=3, warmup=2)
    rail = [2.41, 2.16, 2.04, 2.21, 2.08, 2.19, 2.33]
    # windows 1-2 are warmup; window 3 (2.04) is a new best -> spared;
    # windows 4,5,6 are the 3 consecutive non-improving bad ones
    fired = [w.feed(100 * (i + 1), v) for i, v in enumerate(rail)]
    assert fired == [False, False, False, False, False, True, False]
    assert w.diverged_at == 600

    # a healthy run passing high values only during warmup never fires
    w = _WatchdogProbe(patience=3, warmup=2)
    healthy = [6.4, 2.8, 1.2, 0.8, 0.52, 0.61, 0.43, 0.50]
    assert not any(w.feed(100 * (i + 1), v) for i, v in enumerate(healthy))
    assert w.diverged_at is None

    # a slow healthy descent ABOVE the ceiling keeps resetting the
    # streak with new bests — must not fire (real-corpus mel scales can
    # sit above the synthetic-bench ceiling for thousands of steps)
    w = _WatchdogProbe(patience=3, warmup=2)
    slow = [3.0, 2.8, 2.6, 2.7, 2.5, 2.6, 2.55, 2.4, 2.45, 2.3]
    assert not any(w.feed(100 * (i + 1), v) for i, v in enumerate(slow))
    assert w.diverged_at is None
    assert w._bad_windows <= 2


def test_divergence_watchdog_frozen_metrics():
    """Bit-identical mel_l1 across frozen_patience+1 consecutive windows
    fires (random segment sampling makes healthy per-window losses vary);
    a single repeat does not."""
    w = _WatchdogProbe(frozen_patience=3)
    seq = [0.62, 0.44, 0.44, 0.31, 0.29]          # one repeat: fine
    assert not any(w.feed(100 * (i + 1), v) for i, v in enumerate(seq))
    w = _WatchdogProbe(frozen_patience=3)
    fired = [w.feed(100 * (i + 1), v)
             for i, v in enumerate([0.62, 0.31, 0.31, 0.31, 0.31])]
    assert fired == [False, False, False, False, True]
    assert w.diverged_at == 500


def test_halted_trainer_does_not_resume(tmp_path, monkeypatch):
    """After a halt, further train() calls return immediately — the
    long-run benches drive train() in increments and must not silently
    resume a collapsed run."""
    t = np.arange(4096) / 22050.0
    clip = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    trainer = VocoderTrainer(
        [clip], _tiny_cfg(log_every=2, on_divergence="halt"),
        gen=_tiny_gen(), ckpt_dir=tmp_path, use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    monkeypatch.setattr(trainer, "_check_divergence",
                        lambda step, m: trainer.__setattr__(
                            "diverged_at", step) or True)
    trainer.train(steps=10)
    assert int(jax.device_get(trainer.state.step)) == 2
    trainer.train(steps=10)                        # must be a no-op
    assert int(jax.device_get(trainer.state.step)) == 2


def test_halt_writes_last_healthy_snapshot(tmp_path, monkeypatch):
    """Halt mode keeps a rolling host-side generator snapshot at healthy
    log windows and writes it as generator_last_healthy next to the
    diverged-state checkpoint (ADVICE r04: with a large save_every there
    is otherwise no good checkpoint to restart from)."""
    t = np.arange(4096) / 22050.0
    clip = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    trainer = VocoderTrainer(
        [clip], _tiny_cfg(log_every=2, on_divergence="halt",
                          healthy_snapshot_windows=1, save_every=10 ** 9),
        gen=_tiny_gen(), ckpt_dir=tmp_path, use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    # healthy for the first two windows (snapshots at steps 2 and 4),
    # diverged at the third
    def fire_third(step, m):
        if step >= 6:
            trainer.diverged_at = step
            return True
        return False

    monkeypatch.setattr(trainer, "_check_divergence", fire_third)
    trainer.train(steps=10)
    assert trainer.diverged_at == 6
    assert (tmp_path / "6" / "generator").exists()          # forensics
    assert (tmp_path / "6" / "generator_last_healthy").exists()
    # the snapshot is the step-4 healthy state, loadable as a generator
    from visual_onoma_to_wave_tpu.utils.checkpoint import load_params
    snap = load_params(tmp_path / "6" / "generator_last_healthy",
                       template=jax.device_get(trainer.state.gen_params))
    assert trainer._healthy_snapshot[0] == 4
    diverged = jax.device_get(trainer.state.gen_params)
    assert any(np.abs(a - b).max() > 0 for a, b in
               zip(jax.tree.leaves(snap), jax.tree.leaves(diverged)))


def test_on_divergence_validation():
    with pytest.raises(ValueError, match="on_divergence"):
        t = np.arange(4096) / 22050.0
        clip = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        VocoderTrainer([clip], _tiny_cfg(on_divergence="explode"),
                       gen=_tiny_gen(), use_mesh=False,
                       mpd=MultiPeriodDiscriminator(**TINY_MPD),
                       msd=MultiScaleDiscriminator(**TINY_MSD))


def test_on_divergence_halt_stops_and_checkpoints(tmp_path, monkeypatch):
    """on_divergence='halt' ends train() at the first flagged log window
    and writes a checkpoint at that step."""
    t = np.arange(4096) / 22050.0
    clip = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    trainer = VocoderTrainer(
        [clip], _tiny_cfg(log_every=2, on_divergence="halt"),
        gen=_tiny_gen(), ckpt_dir=tmp_path, use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    calls = []

    def fire(step, m):
        calls.append(step)
        trainer.diverged_at = step
        return True

    monkeypatch.setattr(trainer, "_check_divergence", fire)
    trainer.train(steps=10)
    # first log window is step 2 -> halted there, not at 10
    assert calls == [2]
    assert int(jax.device_get(trainer.state.step)) == 2
    assert (tmp_path / "2" / "generator").exists()
    # the halt writes a cross-process marker: a FRESH trainer process
    # must refuse to auto-resume the diverged state (GAN collapse does
    # not self-recover, and a restart resets the watchdog's running
    # best, so the factor trigger could never re-fire)
    assert (tmp_path / "2" / "HALTED.json").exists()
    fresh = VocoderTrainer(
        [clip], _tiny_cfg(log_every=2, on_divergence="halt"),
        gen=_tiny_gen(), ckpt_dir=tmp_path, use_mesh=False,
        mpd=MultiPeriodDiscriminator(**TINY_MPD),
        msd=MultiScaleDiscriminator(**TINY_MSD))
    with pytest.raises(ValueError, match="not resumable"):
        fresh.restore()
    with pytest.raises(ValueError, match="not resumable"):
        fresh.restore(step=2)


def test_family_recipe_defaults():
    """family_recipe is the single source of the per-family training
    defaults the CLI applies (cli.py cmd_train_vocoder): families the
    flat HiFi-GAN recipe measurably diverges (docs/PERF.md, BASELINE.md)
    get the stabilized lr/clip; name normalization matches get_vocoder's.
    """
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        family_recipe)

    flat = {"learning_rate": 2e-4, "grad_clip_norm": 0.0, "disc": "msd"}
    for fam in ("hifigan", "hifigan-v2", "hifigan-v3", "vocos", "melgan"):
        assert family_recipe(fam) == flat

    stable = {"learning_rate": 1e-4, "grad_clip_norm": 1e3, "disc": "mrd"}
    for fam in ("bigvgan", "bigvgan-large", "BigVGAN", "big_vgan"):
        assert family_recipe(fam) == stable

    # the istftnet families collapse at ~7-8k steps under the flat recipe
    # and ran a healthy 20k under lr 1e-4 + clip 1e3 (BASELINE.md round-5
    # stabilized arm) — their default is the stabilized recipe with the
    # HiFi-GAN MPD+MSD discriminator pair
    stable_msd = {"learning_rate": 1e-4, "grad_clip_norm": 1e3,
                  "disc": "msd"}
    for fam in ("istftnet", "istftnet-mel", "iSTFTNet-mel", "istftnet_mel"):
        assert family_recipe(fam) == stable_msd
