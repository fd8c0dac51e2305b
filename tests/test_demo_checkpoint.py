"""Committed demo checkpoints (examples/checkpoints/demo) load and serve.

The reference distributes pretrained weights via setup.sh downloads (both
blobs stripped here); this framework commits its own small artifacts
trained by examples/train_demo_artifacts.py on a synthetic corpus. This
test is the out-of-the-box guarantee: a fresh clone synthesizes audio
with no training, network, or font.
"""
import json
import pathlib

import numpy as np
import pytest

DEMO = pathlib.Path(__file__).resolve().parents[1] / (
    "examples/checkpoints/demo")

pytestmark = pytest.mark.skipif(
    not (DEMO / "config.json").exists(),
    reason="demo checkpoints not built (examples/train_demo_artifacts.py)")


@pytest.fixture(scope="module")
def synth():
    from visual_onoma_to_wave_tpu.cli import load_config
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    cfg = load_config(str(DEMO / "config.json"))
    # the committed config carries an absolute build-time path; point it at
    # the checked-out location
    cfg = cfg.replace(path=cfg.path.__class__(
        corpus="", formatted="", preprocessed=str(DEMO / "preprocessed"),
        font="", ckpt="/tmp/vow_demo_t/ckpt", log="/tmp/vow_demo_t/log",
        result="/tmp/vow_demo_t/result"))
    return Synthesizer.from_checkpoint(
        cfg, acoustic=str(DEMO / "acoustic"), vocoder=str(DEMO / "vocoder"))


def test_demo_checkpoint_synthesizes(synth):
    meta = json.loads((DEMO / "preprocessed" / "audiotype.json").read_text())
    cls = next(iter(meta))
    res = synth.synthesize("パンパン", cls)
    assert res.wav is not None and res.mel_len >= 4
    assert np.isfinite(res.wav).all()
    assert res.wav.shape[0] == res.mel_len * 256
    # a trained model emits non-silent audio
    assert float(np.abs(res.wav).max()) > 1e-3


def test_demo_checkpoint_duration_control(synth):
    meta = json.loads((DEMO / "preprocessed" / "audiotype.json").read_text())
    cls = next(iter(meta))
    short = synth.synthesize("パンパン", cls, d_control=0.7)
    long = synth.synthesize("パンパン", cls, d_control=1.5)
    assert long.mel_len > short.mel_len


@pytest.mark.parametrize("cfg_name,voc_dir,family", [
    ("config_istftnet.json", "vocoder_istftnet_mel", "iSTFTNet-mel"),
    ("config_vocos.json", "vocoder_vocos", "Vocos"),
])
def test_demo_checkpoint_alt_vocoder(cfg_name, voc_dir, family):
    """Each committed alternate vocoder (the fast beyond-reference families)
    serves the same acoustic checkpoint through its own config."""
    from visual_onoma_to_wave_tpu.cli import load_config
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    if not (DEMO / cfg_name).exists():
        pytest.skip(f"alt demo vocoder {family} not built")
    cfg = load_config(str(DEMO / cfg_name))
    assert cfg.model.vocoder_model == family
    cfg = cfg.replace(path=cfg.path.__class__(
        corpus="", formatted="", preprocessed=str(DEMO / "preprocessed"),
        font="", ckpt="/tmp/vow_demo_t/ckpt", log="/tmp/vow_demo_t/log",
        result="/tmp/vow_demo_t/result"))
    synth = Synthesizer.from_checkpoint(
        cfg, acoustic=str(DEMO / "acoustic"),
        vocoder=str(DEMO / voc_dir))
    meta = json.loads((DEMO / "preprocessed" / "audiotype.json").read_text())
    res = synth.synthesize("パンパン", next(iter(meta)))
    assert res.wav is not None and res.mel_len >= 4
    assert np.isfinite(res.wav).all()
    assert res.wav.shape[0] == res.mel_len * 256
    assert float(np.abs(res.wav).max()) > 1e-3
    # the batched fused path is family-agnostic too
    batch = synth.synthesize_batch(["パン", "ドドド"],
                                   [next(iter(meta))] * 2, return_mel=False)
    for r in batch:
        assert r.wav is not None and np.isfinite(r.wav).all()
        assert r.wav.shape[0] == r.mel_len * 256


@pytest.mark.slow  # ~37 s: compiles a second fused-executable bucket
def test_text_normalization(synth):
    """Characters encode_text strips ('{', '}', newline) must not crash the
    per-character length bookkeeping; empty text raises cleanly."""
    meta = json.loads((DEMO / "preprocessed" / "audiotype.json").read_text())
    cls = next(iter(meta))
    dirty = synth.synthesize("パ{ン}\nパン", cls)
    clean = synth.synthesize("パンパン", cls)
    assert dirty.durations.shape == clean.durations.shape
    with pytest.raises(ValueError, match="empty"):
        synth.synthesize("{}\n", cls)
    with pytest.raises(ValueError, match="empty"):
        synth.synthesize_batch(["パン", ""], [cls, cls])


def test_library_input_validation(synth):
    """Unknown audiotypes and bad numeric controls raise clear ValueErrors
    at the library surface (mirroring the HTTP edge's checks)."""
    meta = json.loads((DEMO / "preprocessed" / "audiotype.json").read_text())
    cls = next(iter(meta))
    with pytest.raises(ValueError, match="valid classes"):
        synth.synthesize("パン", "no-such-class")
    with pytest.raises(ValueError, match="d_control"):
        synth.synthesize("パン", cls, d_control=float("nan"))
    with pytest.raises(ValueError, match="e_control"):
        synth.synthesize("パン", cls, e_control=-1.0)
    with pytest.raises(ValueError, match="width_rates"):
        synth.synthesize("パン", cls, width_rates=[1.0, 0.0])
    with pytest.raises(ValueError, match="valid classes"):
        synth.synthesize_batch(["パン"], ["no-such-class"])
    with pytest.raises(ValueError, match="d_control"):
        synth.synthesize_batch(["パン"], [cls], d_control=[float("inf")])


@pytest.mark.slow  # ~47 s: two full CLI runs incl. checkpoint loads
def test_cli_synthesize_batch(tmp_path):
    """`cli synthesize-batch` writes one wav per input row for both row
    formats (split-style name|audiotype|fontsize|font|text and TSV)."""
    import wave

    from visual_onoma_to_wave_tpu.cli import main

    meta = json.loads((DEMO / "preprocessed" / "audiotype.json").read_text())
    classes = list(meta)
    inp = tmp_path / "rows.txt"
    inp.write_text(
        f"clip_a|{classes[0]}|24|x|パンパン\n"
        f"clip_b|{classes[-1]}|24|x|ドド\n",
        encoding="utf-8")
    out = tmp_path / "wavs"
    cfg = tmp_path / "cfg.json"
    c = json.loads((DEMO / "config.json").read_text())
    c["path"]["preprocessed"] = str(DEMO / "preprocessed")
    cfg.write_text(json.dumps(c))
    rc = main(["synthesize-batch", str(cfg), str(inp), str(out),
               "--acoustic", str(DEMO / "acoustic"),
               "--vocoder", str(DEMO / "vocoder"), "--batch-size", "2"])
    assert rc in (0, None)
    for name in ("clip_a", "clip_b"):
        with wave.open(str(out / f"{name}.wav")) as w:
            assert w.getnframes() > 0

    # TSV format with per-row duration control
    inp.write_text(f"パン\t{classes[0]}\t1.4\n", encoding="utf-8")
    rc = main(["synthesize-batch", str(cfg), str(inp), str(out),
               "--acoustic", str(DEMO / "acoustic"),
               "--vocoder", str(DEMO / "vocoder")])
    assert rc in (0, None)
    assert (out / "00000.wav").exists()


def test_demo_checkpoint_batch_serving(synth):
    meta = json.loads((DEMO / "preprocessed" / "audiotype.json").read_text())
    classes = list(meta)
    res = synth.synthesize_batch(
        ["パン", "ドドド"], [classes[0], classes[-1]], return_mel=False)
    for r in res:
        assert r.wav is not None and np.isfinite(r.wav).all()
        assert r.wav.shape[0] == r.mel_len * 256
