"""CLI-level end-to-end: format -> prepare-tg -> preprocess -> train ->
evaluate -> synthesize, all through `cli.main` on a synthetic raw corpus.

This exercises arg parsing, config loading and command wiring — the
library-level equivalents are covered by test_pipeline_e2e.py.
"""
import json
import pathlib

import numpy as np
import pytest

from visual_onoma_to_wave_tpu.cli import main as cli_main
from visual_onoma_to_wave_tpu.data.audio_io import write_wav

SR_RAW = 48000


def _tone_clip(rng, n_chars, sec_per_char=0.18, lead=0.12, tail=0.12):
    """48 kHz tone clip + julius-style .lab lines (seconds)."""
    total = lead + n_chars * sec_per_char + tail
    t = np.arange(int(total * SR_RAW)) / SR_RAW
    wav = np.zeros_like(t, dtype=np.float32)
    lab = [f"0.0000 {lead:.4f} silB"]
    cur = lead
    for i in range(n_chars):
        f = 300.0 * (1.3 ** i)
        seg = (t >= cur) & (t < cur + sec_per_char)
        env = np.hanning(seg.sum()).astype(np.float32)
        wav[seg] = 0.5 * np.sin(2 * np.pi * f * t[seg]).astype(np.float32) * env
        lab.append(f"{cur:.4f} {cur + sec_per_char:.4f} X")  # placeholder
        cur += sec_per_char
    lab.append(f"{cur:.4f} {total:.4f} silE")
    return wav, lab


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic raw corpus in the REAL RWCP-SSD layout the reference's
    01_format.py consumes: audio under <take>/<label>/48khz/<clip>.raw,
    4-field .ono rows keyed by onomatopoeia_id, 4-field .acc rows, labs
    named <clip>-<onomatopoeia_id>.lab next to the .ono files."""
    root = tmp_path_factory.mktemp("cli_corpus")
    raw_root = root / "RWCP-SSD"
    ono_root = root / "onoma"
    texts = {"000": "パン", "001": "パンパ", "013": "トント", "002": "カッ"}
    rng = np.random.default_rng(0)
    for label in ("drum",):
        (raw_root / "nospeech" / "drysrc" / "c1" / label / "48khz"
         ).mkdir(parents=True)
        od = ono_root / "c1" / label
        od.mkdir(parents=True)
        for num, text in texts.items():
            ono_id = f"0704_{num}"
            wav, lab = _tone_clip(rng, len(text))
            # write 16-bit little-endian raw
            (raw_root / "nospeech" / "drysrc" / "c1" / label / "48khz"
             / f"{num}.raw").write_bytes(
                (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes())
            # .ono: worker,onomatopoeia_id,onomatopoeia,self_score
            # .acc: onomatopoeia_id,onomatopoeia,rater_worker,score
            (od / f"{num}.ono").write_text(f"w1,{ono_id},{text},5\n")
            (od / f"{num}.acc").write_text(
                f"{ono_id},{text},w2,4\n{ono_id},{text},w3,5\n")
            lab_lines = []
            ci = 0
            for line in lab:
                if line.endswith(" X"):
                    a, b, _ = line.split(" ")
                    lab_lines.append(f"{a} {b} {text[ci]}")
                    ci += 1
                else:
                    lab_lines.append(line)
            (od / f"{num}-{ono_id}.lab").write_text(
                "\n".join(lab_lines) + "\n")

    cfg = {
        "path": {
            "corpus": str(ono_root),
            "formatted": str(root / "formatted"),
            "preprocessed": str(root / "preprocessed"),
            "font": "",
            "ckpt": str(root / "out" / "ckpt"),
            "log": str(root / "out" / "log"),
            "result": str(root / "out" / "result"),
        },
        "dataset": {"extract_labels": ["drum"], "valtest_id": [13],
                    "confidence_score_border": 3.0,
                    "acceptance_score_border": 2.5},
        "model": {
            "transformer": {"encoder_layer": 1, "decoder_layer": 1,
                            "encoder_hidden": 32, "decoder_hidden": 32,
                            "conv_filter_size": 64,
                            "conv_kernel_size": [3, 1]},
            "visual_feature_extractor": {"layer_num": 1},
            "max_seq_len": 512,
        },
        "train": {
            "optimizer": {"batch_size": 2, "warm_up_step": 10},
            "step": {"total_step": 2, "log_step": 1, "synth_step": 100,
                     "val_step": 100, "save_step": 100},
            "max_mel_len": 512, "seed": 0,
        },
    }
    cfg_path = root / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))
    return root, str(cfg_path), str(raw_root)


@pytest.mark.slow  # ~77 s: 4-pass preprocess + train + synthesize
def test_cli_full_pipeline(corpus, capsys):
    root, cfg, raw_root = corpus

    cli_main(["format", cfg, raw_root])
    assert (root / "formatted" / "text" / "drum" / "data.txt").exists()
    assert (root / "formatted" / "audio" / "drum").glob("*.wav")
    assert list((root / "formatted" / "lab" / "drum").glob("*.lab"))

    cli_main(["prepare-tg", cfg])
    assert list((root / "formatted" / "TextGrid" / "drum").glob("*.TextGrid"))
    assert (root / "formatted" / "dataset_length.json").exists()

    cli_main(["preprocess", cfg])
    pre = root / "preprocessed"
    for f in ("train.txt", "val.txt", "test.txt", "stats.json",
              "audiotype.json", "visual_text.json"):
        assert (pre / f).exists(), f
    train_rows = (pre / "train.txt").read_text().splitlines()
    valtest_rows = ((pre / "val.txt").read_text().splitlines()
                    + (pre / "test.txt").read_text().splitlines())
    assert train_rows and valtest_rows
    # valtest routing: numbering 013 only goes to val/test, never train
    assert all(r.split("|")[0].split("-")[2] != "013" for r in train_rows
               if r.strip())
    assert all(r.split("|")[0].split("-")[2] == "013" for r in valtest_rows
               if r.strip())

    cli_main(["train", cfg])
    assert list((root / "out" / "ckpt").iterdir())

    cli_main(["evaluate", cfg])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    losses = json.loads(out)
    assert np.isfinite(losses["total_loss"])

    wav_out = root / "synth.wav"
    cli_main(["synthesize", cfg, "--text", "パン", "--audiotype", "drum",
              "--out", str(wav_out)])
    out = capsys.readouterr().out
    assert "mel frames" in out

    # standalone serving: synthesize must work with NO split txt files
    # present (metadata + symbols.json + checkpoint only) — the reference
    # demo likewise loads only model + vocoder + maps (prediction.ipynb)
    moved = []
    for name in ("train.txt", "val.txt", "test.txt"):
        p = pre / name
        q = pre / (name + ".hidden")
        p.rename(q)
        moved.append((p, q))
    try:
        cli_main(["synthesize", cfg, "--text", "パン", "--audiotype", "drum",
                  "--out", str(root / "synth2.wav")])
        out = capsys.readouterr().out
        assert "mel frames" in out
    finally:
        for p, q in moved:
            q.rename(p)


def test_cli_convert_vocoder_roundtrip(tmp_path, capsys):
    """convert-vocoder consumes a real torch checkpoint file (torch.save)
    and emits orbax params usable by the generator; --kind MelGAN too."""
    import torch
    import jax.numpy as jnp
    from test_hifigan import make_state, UPS, UPK, RKS, RDS, CH0, N_MELS
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.utils.checkpoint import load_params

    state = make_state(np.random.default_rng(0))
    ckpt = tmp_path / "generator.pth.tar"
    torch.save({"generator": state}, ckpt)
    out_dir = tmp_path / "voc"
    cli_main(["convert-vocoder", str(ckpt), str(out_dir)])
    params = load_params(out_dir)
    gen = HiFiGANGenerator(
        upsample_rates=UPS, upsample_kernel_sizes=UPK,
        upsample_initial_channel=CH0, resblock_kernel_sizes=RKS,
        resblock_dilations=RDS, n_mels=N_MELS)
    wav = gen.apply(params, jnp.zeros((1, 7, N_MELS), jnp.float32))
    assert wav.shape == (1, 7 * 256)
    assert np.isfinite(np.asarray(wav)).all()


def test_cli_convert_acoustic_roundtrip(tmp_path):
    """convert-acoustic consumes a torch vTTS checkpoint ({'model': ...},
    DataParallel-prefixed) and emits loadable orbax variables."""
    import torch
    from test_convert_acoustic import make_state, _model, ENC_L, DEC_L, VFE_L
    from visual_onoma_to_wave_tpu.utils.checkpoint import load_params

    state = make_state(np.random.default_rng(1))
    # simulate nn.DataParallel "module." prefixes (reference 04_train.py:161)
    prefixed = {f"module.{k}": v for k, v in state.items()}
    ckpt = tmp_path / "200000.pth.tar"
    torch.save({"model": prefixed, "optimizer": {}}, ckpt)
    out_dir = tmp_path / "ac"
    # the CLI hard-codes ICASSP layer counts; call the loader directly with
    # the test's shrunken geometry and check the CLI wrapper separately
    from visual_onoma_to_wave_tpu.models.convert_acoustic import (
        convert_vtts_state_dict)
    import numpy as _np
    obj = torch.load(ckpt, map_location="cpu", weights_only=False)
    raw = {k.removeprefix("module."): _np.asarray(v)
           for k, v in obj["model"].items()}
    variables = convert_vtts_state_dict(
        raw, encoder_layers=ENC_L, decoder_layers=DEC_L, vfe_layers=VFE_L)
    from visual_onoma_to_wave_tpu.utils.checkpoint import save_params
    save_params(out_dir, variables)
    got = load_params(out_dir)
    assert "params" in got and "batch_stats" in got
    assert "encoder" in got["params"] and "postnet" in got["params"]


def test_read_batch_rows_formats_and_errors(tmp_path):
    """synthesize-batch input parsing: both row formats, comments/blank
    lines skipped, and clear errors for malformed rows."""
    import pytest

    from visual_onoma_to_wave_tpu.cli import _read_batch_rows

    p = tmp_path / "rows.txt"
    p.write_text(
        "# comment\n"
        "\n"
        "clip_x|drum|24|font|パン\n"
        "ドドド\tbell\t1.2\t0.8\n",
        encoding="utf-8")
    rows = _read_batch_rows(p)
    assert rows[0] == {"name": "clip_x", "text": "パン",
                       "audiotype": "drum", "d": 1.0, "e": 1.0}
    assert rows[1]["text"] == "ドドド" and rows[1]["d"] == 1.2
    assert rows[1]["e"] == 0.8

    p.write_text("a|b|c\n", encoding="utf-8")
    with pytest.raises(ValueError, match="5 .-separated fields"):
        _read_batch_rows(p)

    p.write_text("textonly\n", encoding="utf-8")
    with pytest.raises(ValueError, match="TSV rows"):
        _read_batch_rows(p)
