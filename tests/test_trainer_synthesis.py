"""Trainer orchestration, checkpoint/resume, and synthesis API tests on a
tiny synthetic preprocessed corpus."""
import json
import pathlib

import numpy as np
import pytest

from visual_onoma_to_wave_tpu.config import Config, DatasetMetadata, FeatureStats


def make_preprocessed(root: pathlib.Path, n_clips=8, n_mels=80, height=24,
                      cell_width=30):
    """Write a minimal preprocessed directory with consistent artifacts."""
    rng = np.random.default_rng(0)
    label = "drum"
    for d in ("mel", "duration", "energy", "kurtosis"):
        (root / d / label).mkdir(parents=True)
    (root / "image" / "png" / label).mkdir(parents=True)
    (root / "image" / "width" / label).mkdir(parents=True)
    rows_train, rows_val = [], []
    from PIL import Image
    for i in range(n_clips):
        text = "パン" * (1 + i % 2)
        C = len(text)
        dur = rng.integers(8, 20, C).astype(np.int32)
        T = int(dur.sum())
        name = f"f_24pt_c1-drum-{i:03d}-x"
        np.save(root / "mel" / label / f"{name}.npy",
                rng.standard_normal((T, n_mels)).astype(np.float32))
        np.save(root / "duration" / label / f"{name}.npy", dur)
        np.save(root / "energy" / label / f"{name}.npy",
                rng.standard_normal(C).astype(np.float32))
        np.save(root / "kurtosis" / label / f"{name}.npy",
                rng.standard_normal(C).astype(np.float32))
        widths = np.full(C, cell_width // 2, np.int32)
        np.save(root / "image" / "width" / label / f"{name}.npy", widths)
        img = Image.fromarray(
            rng.integers(0, 255, (height, int(widths.sum())), np.uint8))
        img.save(root / "image" / "png" / label / f"{name}.png")
        row = f"{name}|{label}|24|f|{text}"
        (rows_train if i % 4 else rows_val).append(row)
    (root / "train.txt").write_text("\n".join(rows_train) + "\n")
    (root / "val.txt").write_text("\n".join(rows_val) + "\n")
    (root / "test.txt").write_text("")
    meta = DatasetMetadata(
        audiotype_map={label: 0},
        energy_stats=FeatureStats(-2, 2, 0, 1),
        kurtosis_stats=FeatureStats(-2, 2, 0, 1),
        max_pixelsize=cell_width, image_height=height,
        label_width={label: (4.0, 30.0, 10.0)})
    meta.save(root)
    return meta


@pytest.fixture(scope="module")
def tiny_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("pre")
    meta = make_preprocessed(root)
    out = tmp_path_factory.mktemp("out")
    cfg = Config()
    cfg = cfg.replace(
        path=cfg.path.__class__(
            preprocessed=str(root), ckpt=str(out / "ckpt"),
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
                total_step=6, log_step=2, synth_step=3, val_step=3,
                save_step=5),
            max_mel_len=256, seed=0))
    return cfg


def test_trainer_runs_and_checkpoints(tiny_env):
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    trainer = Trainer(tiny_env, use_mesh=False)
    state = trainer.train()
    assert int(state.step) >= 6
    # checkpoints written at save_step and at end
    steps = trainer.ckpt.all_steps()
    assert 5 in steps and int(state.step) in steps
    # metrics.jsonl has rows
    lines = (pathlib.Path(tiny_env.path.log) / "train" / "metrics.jsonl"
             ).read_text().splitlines()
    assert len(lines) >= 2
    rec = json.loads(lines[-1])
    assert "total_loss" in rec and np.isfinite(rec["total_loss"])
    trainer.ckpt.close()


def test_trainer_resume(tiny_env):
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    t2 = Trainer(tiny_env, restore_step=5, use_mesh=False)
    assert int(t2.state.step) == 5
    val = t2.evaluate()
    assert np.isfinite(val["total_loss"])
    t2.ckpt.close()


def test_synthesizer_end_to_end(tiny_env):
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    trainer = Trainer(tiny_env, use_mesh=False)
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    gp = gen.init(__import__("jax").random.PRNGKey(0),
                  jnp.zeros((1, 8, 80), jnp.float32))

    synth = Synthesizer(tiny_env, trainer.model, trainer.state,
                        trainer.metadata, trainer.train_ds.symbol_map, gp,
                        vocoder=gen)
    res = synth.synthesize("パンパン", "drum", width_rates=[1.0, 0.5, 1.0, 0.5])
    assert res.mel.shape[1] == 80
    assert res.durations.shape == (4,)
    assert res.image is not None and res.image.shape[0] == 24
    if res.wav is not None:
        assert res.wav.shape[0] == res.mel.shape[0] * 256
        assert np.isfinite(res.wav).all()
    # duration control halves the length (approximately, via rounding)
    res_fast = synth.synthesize("パンパン", "drum", d_control=0.5)
    assert res_fast.mel.shape[0] <= res.mel.shape[0] + 1
    trainer.ckpt.close()


def test_trainer_profiler_trace(tiny_env, tmp_path):
    """profile_dir captures a jax.profiler trace over the configured window."""
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    prof = tmp_path / "trace"
    trainer = Trainer(tiny_env, use_mesh=False, profile_dir=str(prof),
                      profile_steps=(2, 4))
    trainer.train(max_steps=5)
    trainer.ckpt.close()
    assert prof.exists() and any(prof.rglob("*")), "no trace files written"


def test_synthesize_batch(tiny_env):
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    trainer = Trainer(tiny_env, use_mesh=False)
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    gp = gen.init(__import__("jax").random.PRNGKey(0),
                  jnp.zeros((1, 8, 80), jnp.float32))
    synth = Synthesizer(tiny_env, trainer.model, trainer.state,
                        trainer.metadata, trainer.train_ds.symbol_map, gp,
                        vocoder=gen)
    texts = ["パン", "パンパン", "ンンン"]
    results = synth.synthesize_batch(texts, ["drum"] * 3)
    assert len(results) == 3
    for text, r in zip(texts, results):
        assert r.durations.shape == (len(text),)
        assert r.mel.shape[1] == 80
        assert r.wav is not None
        assert r.wav.shape[0] == r.mel.shape[0] * 256
        assert np.isfinite(r.wav).all()
    # batch path must agree with the single-item path on the same input
    single = synth.synthesize("パンパン", "drum")
    np.testing.assert_array_equal(results[1].durations, single.durations)
    np.testing.assert_allclose(results[1].mel, single.mel, atol=1e-4)
    # return_mel=False (the HTTP server's mode): no mel download, but
    # mel_len is set and the fused-dispatch waveform is identical
    lean = synth.synthesize_batch(texts, ["drum"] * 3, return_mel=False)
    for r, l in zip(results, lean):
        assert l.mel is None
        assert l.mel_len == r.mel.shape[0]
        np.testing.assert_array_equal(l.wav, r.wav)
    # standalone mel -> wav surface (externally produced mels)
    ws = synth.vocode(results[0].mel[None], [results[0].mel_len])
    assert ws[0].shape == (results[0].mel_len * 256,)
    assert np.isfinite(ws[0]).all()
    trainer.ckpt.close()


def test_trainer_text_path(tiny_env):
    """use_image=False trains through the char-embedding encoder path
    (reference use_image flag at 04_train.py / vtts.py forward)."""
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    cfg = tiny_env.replace(
        train=tiny_env.train.__class__(
            optimizer=tiny_env.train.optimizer,
            step=tiny_env.train.step.__class__(
                total_step=2, log_step=1, synth_step=100, val_step=100,
                save_step=100),
            use_image=False, max_mel_len=256, seed=0))
    trainer = Trainer(cfg, use_mesh=False)
    state = trainer.train(max_steps=2)
    assert int(state.step) >= 2
    assert "src_word_emb" in state.params
    assert "vfe" not in state.params
    trainer.ckpt.close()


def test_mesh_batch_divisibility_guard(tiny_env):
    """A batch size not divisible by the data mesh must be reconciled
    loudly at init (mesh shrunk to the largest divisor) — never a silent
    single-device run — and _place(strict=True) must reject ragged
    training batches outright."""
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    # tiny_env batch_size=2, test env has 8 virtual devices -> gcd 2
    with pytest.warns(UserWarning, match="not divisible"):
        trainer = Trainer(tiny_env, use_mesh=True)
    assert trainer.mesh is not None and trainer.mesh.size == 2
    state = trainer.train(max_steps=1)
    assert int(state.step) >= 1

    # strict path: a ragged batch raises instead of silently unsharding
    ragged = next(trainer.train_ds.batches(shuffle=False))
    ragged = {k: (v[:1] if hasattr(v, "shape") else v[:1])
              for k, v in ragged.items()}
    with pytest.raises(ValueError, match="not divisible by the data-mesh"):
        trainer._place({k: v for k, v in ragged.items()
                        if k not in ("names", "mel_lens")}, strict=True)
    # non-strict (eval tail): warn once and run single-device
    with pytest.warns(UserWarning, match="single device"):
        out = trainer._place({k: v for k, v in ragged.items()
                              if k not in ("names", "mel_lens")})
    assert out["texts"].shape[0] == 1
    trainer.ckpt.close()


def test_synthesize_oov_text(tiny_env):
    """Out-of-vocabulary characters: PAD fallback on the image path (ids are
    unused there), hard KeyError on the text path (advisor finding: silently
    synthesizing from all-zero ids)."""
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    trainer = Trainer(tiny_env, use_mesh=False)
    synth = Synthesizer(tiny_env, trainer.model, trainer.state,
                        trainer.metadata, trainer.train_ds.symbol_map)
    res = synth.synthesize("ドン", "drum")   # ド/ン partly OOV, image path OK
    assert res.mel.shape[1] == 80

    cfg = tiny_env.replace(
        train=tiny_env.train.__class__(
            optimizer=tiny_env.train.optimizer, step=tiny_env.train.step,
            use_image=False, max_mel_len=256, seed=0))
    t2 = Trainer(cfg, use_mesh=False)
    synth_txt = Synthesizer(cfg, t2.model, t2.state, t2.metadata,
                            t2.train_ds.symbol_map)
    with pytest.raises(KeyError, match="not in the training vocabulary"):
        synth_txt.synthesize("ドドド", "drum")
    with pytest.raises(KeyError, match="not in the training vocabulary"):
        synth_txt.synthesize_batch(["ドドド"], ["drum"])
    trainer.ckpt.close()
    t2.ckpt.close()


def test_synthesizer_with_melgan_vocoder(tiny_env):
    """model.vocoder_model = MelGAN: the fused acoustic+vocoder executable
    must apply MelGAN's log10-domain conversion (reference
    utils/model.py:77) — its waveform must equal the generator applied to
    postnet_mel / ln(10)."""
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models.melgan import MelGANGenerator
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    cfg = tiny_env.replace(
        model=tiny_env.model.__class__(
            transformer=tiny_env.model.transformer,
            visual_feature_extractor=tiny_env.model.visual_feature_extractor,
            max_seq_len=tiny_env.model.max_seq_len,
            vocoder_model="MelGAN"))
    trainer = Trainer(cfg, use_mesh=False)
    gen = MelGANGenerator(ngf=4)
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32))
    synth = Synthesizer(cfg, trainer.model, trainer.state, trainer.metadata,
                        trainer.train_ds.symbol_map, gp, vocoder=gen)
    res = synth.synthesize("パンパン", "drum")
    assert res.wav is not None
    assert res.wav.shape[0] == res.mel.shape[0] * 256
    assert np.isfinite(res.wav).all()
    # domain parity: the fused executable must hand the vocoder log10 mels —
    # its waveform must equal the generator applied to postnet_mel / ln(10)
    from visual_onoma_to_wave_tpu.models.melgan import LN10
    text, n = "パンパン", 4
    ids = np.zeros((1, synth.text_bucket), np.int32)
    ids[0, :n] = synth._encode(text)
    batch = {
        "audiotypes": jnp.asarray([0], jnp.int32),
        "texts": jnp.asarray(ids),
        "src_lens": jnp.asarray([n], jnp.int32),
        "image_cells": jnp.asarray(
            synth._render_cells(text, [1.0] * n)[None]),
    }
    out = synth._get_fused_step()(synth.state, gp, batch)
    ref = gen.apply(gp, np.asarray(out["postnet_mel"]) / LN10)
    np.testing.assert_allclose(np.asarray(out["wav"]), np.asarray(ref),
                               atol=1e-5)
    trainer.ckpt.close()


def test_synthesizer_with_vocos_vocoder(tiny_env):
    """model.vocoder_model = Vocos (models/vocos.py): the fused executable
    serves the ConvNeXt family with NO mel-domain conversion (it is trained
    in the acoustic model's natural-log domain, like HiFi-GAN) — its
    waveform must equal the generator applied to postnet_mel directly."""
    import jax
    import jax.numpy as jnp
    from visual_onoma_to_wave_tpu.models.vocos import VocosGenerator
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    cfg = tiny_env.replace(
        model=tiny_env.model.__class__(
            transformer=tiny_env.model.transformer,
            visual_feature_extractor=tiny_env.model.visual_feature_extractor,
            max_seq_len=tiny_env.model.max_seq_len,
            vocoder_model="Vocos",
            vocoder_kwargs={"dim": 16, "intermediate_dim": 32,
                            "num_layers": 2}))
    trainer = Trainer(cfg, use_mesh=False)
    from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
    gen = get_vocoder(cfg.model.vocoder_model, **dict(cfg.model.vocoder_kwargs))
    assert isinstance(gen, VocosGenerator) and gen.dim == 16
    gp = gen.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80), jnp.float32))
    synth = Synthesizer(cfg, trainer.model, trainer.state, trainer.metadata,
                        trainer.train_ds.symbol_map, gp)  # module from config
    res = synth.synthesize("パンパン", "drum")
    assert isinstance(synth._vocoder_module(), VocosGenerator)
    assert res.wav is not None
    assert res.wav.shape[0] == res.mel.shape[0] * 256
    assert np.isfinite(res.wav).all()
    text, n = "パンパン", 4
    ids = np.zeros((1, synth.text_bucket), np.int32)
    ids[0, :n] = synth._encode(text)
    batch = {
        "audiotypes": jnp.asarray([0], jnp.int32),
        "texts": jnp.asarray(ids),
        "src_lens": jnp.asarray([n], jnp.int32),
        "image_cells": jnp.asarray(
            synth._render_cells(text, [1.0] * n)[None]),
    }
    out = synth._get_fused_step()(synth.state, gp, batch)
    ref = gen.apply(gp, np.asarray(out["postnet_mel"]))
    np.testing.assert_allclose(np.asarray(out["wav"]), np.asarray(ref),
                               atol=1e-5)
    trainer.ckpt.close()


def test_examples_demo_script(tiny_env, tmp_path, monkeypatch):
    """examples/demo.py (the prediction.ipynb equivalent) runs end-to-end
    from a config file and writes the visual-onomatopoeia + mel plot."""
    import json
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    import examples.demo as demo

    cfg_path = tmp_path / "cfg.json"
    # serialize the tiny_env fixture config to a loadable dict
    import dataclasses
    cfg_path.write_text(json.dumps(dataclasses.asdict(tiny_env)))
    monkeypatch.chdir(tmp_path)
    demo.main([str(cfg_path), "--text", "パン", "--out-dir",
               str(tmp_path / "demo_out")])
    outs = list((tmp_path / "demo_out").iterdir())
    names = {p.name for p in outs}
    assert any(n.endswith("_mel.png") for n in names)
    assert any(n.endswith(".png") and not n.endswith("_mel.png")
               for n in names)
