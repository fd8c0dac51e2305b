"""Corpus integrity checker (data/doctor.py, cli doctor).

The reference has no validation tooling — a stale/broken preprocessed dir
fails deep inside training. The doctor must pass a healthy corpus and
name each class of corruption."""
import json
import pathlib

import numpy as np
import pytest

from test_trainer_synthesis import make_preprocessed
from visual_onoma_to_wave_tpu.config import Config
from visual_onoma_to_wave_tpu.data.doctor import check_corpus


@pytest.fixture()
def corpus_cfg(tmp_path):
    make_preprocessed(tmp_path)
    cfg = Config()
    return cfg.replace(path=cfg.path.__class__(
        preprocessed=str(tmp_path), font=""))


def test_clean_corpus_passes(corpus_cfg):
    report = check_corpus(corpus_cfg)
    assert report["ok"], report["problems"]
    assert report["checked_rows"] == 8
    assert report["counts"]["train"] == 6
    assert report["n_audiotype"] == 1 and report["n_vocab"] >= 2


def test_detects_corruptions(corpus_cfg, tmp_path):
    root = tmp_path
    # 1. duration / mel mismatch
    dur_files = sorted((root / "duration" / "drum").glob("*.npy"))
    d = np.load(dur_files[0])
    d[0] += 3
    np.save(dur_files[0], d)
    # 2. missing energy file
    e_files = sorted((root / "energy" / "drum").glob("*.npy"))
    e_files[1].unlink()
    # 3. split overlap: duplicate a train row into val
    train = (root / "train.txt").read_text().splitlines()
    (root / "val.txt").write_text(
        (root / "val.txt").read_text() + train[0] + "\n")
    # 4. wrong image width
    w_files = sorted((root / "image" / "width" / "drum").glob("*.npy"))
    w = np.load(w_files[2])
    np.save(w_files[2], w + 1)

    report = check_corpus(corpus_cfg)
    assert not report["ok"]
    text = "\n".join(report["problems"])
    assert "durations sum" in text
    assert "missing energy" in text
    assert "appears in both" in text
    assert "sum(widths)" in text


def test_detects_unnormalized_energy(corpus_cfg, tmp_path):
    for p in (tmp_path / "energy" / "drum").glob("*.npy"):
        np.save(p, np.load(p) * 300.0 + 500.0)
    report = check_corpus(corpus_cfg)
    assert not report["ok"]
    assert any("un-normalized" in p for p in report["problems"])


def test_cli_doctor_exit_codes(corpus_cfg, tmp_path, capsys):
    from visual_onoma_to_wave_tpu.cli import main

    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(corpus_cfg.to_dict()))
    assert main(["doctor", str(cfg_path)]) in (0, None)
    out = json.loads(capsys.readouterr().out)
    assert out["ok"]

    (tmp_path / "mel" / "drum" / "nonexistent-check.npy")  # no-op
    dur = sorted((tmp_path / "duration" / "drum").glob("*.npy"))[0]
    d = np.load(dur)
    d[0] += 1
    np.save(dur, d)
    with pytest.raises(SystemExit) as e:
        main(["doctor", str(cfg_path)])
    assert e.value.code == 1


def test_malformed_rows_reported_not_crashed(corpus_cfg, tmp_path):
    (tmp_path / "train.txt").write_text(
        (tmp_path / "train.txt").read_text() + "clip1|drum\n")
    report = check_corpus(corpus_cfg)
    assert not report["ok"]
    assert any("malformed row" in p for p in report["problems"])


def test_checkpoint_vocab_mismatch_detected(corpus_cfg):
    # a checkpoint trained before "ン" existed in the corpus
    report = check_corpus(corpus_cfg, symbols={"パ": 1})
    assert not report["ok"]
    assert any("unencodable" in p for p in report["problems"])
    # the full corpus vocabulary passes
    clean = check_corpus(corpus_cfg)
    assert clean["ok"]


def test_limit_is_per_split(corpus_cfg, tmp_path):
    # corrupt a VAL row; with a train-sized limit the val split must
    # still be covered (limit applies per split, not globally)
    val_rows = (tmp_path / "val.txt").read_text().splitlines()
    name, label = val_rows[0].split("|")[0], val_rows[0].split("|")[1]
    (tmp_path / "energy" / label / f"{name}.npy").unlink()
    report = check_corpus(corpus_cfg, limit=6)
    assert not report["ok"]
    assert any("missing energy" in p for p in report["problems"])


# ---------------------------------------------------------------------------
# formatted-stage doctor (pre-preprocessing)
# ---------------------------------------------------------------------------

@pytest.fixture()
def formatted_cfg(tmp_path):
    from test_pipeline_e2e import synth_clip
    from visual_onoma_to_wave_tpu.data import write_textgrid, write_wav

    formatted = tmp_path / "formatted"
    cfg = Config()
    cfg = cfg.replace(
        path=cfg.path.__class__(formatted=str(formatted), font=""),
        dataset=cfg.dataset.__class__(extract_labels=("drum",)))
    rng = np.random.default_rng(0)
    (formatted / "audio" / "drum").mkdir(parents=True)
    (formatted / "TextGrid" / "drum").mkdir(parents=True)
    (formatted / "text" / "drum").mkdir(parents=True)
    rows = []
    for i, text in enumerate(["パン", "トン"]):
        clip = f"c1_drum_00{i}_0980"
        name = f"{clip}_w1"
        wav, intervals = synth_clip(rng, text, [200.0, 300.0])
        write_wav(formatted / "audio" / "drum" / f"{clip}.wav", wav, 22050)
        write_textgrid(intervals,
                       formatted / "TextGrid" / "drum" / f"{name}.TextGrid")
        rows.append(f"{name}|{clip}|{text}|drum|5.0|4.0")
    rows.append(f"c1_drum_002_0980_w2|c1_drum_002_0980|パ|drum|1.0|4.0")
    (formatted / "text" / "drum" / "data.txt").write_text(
        "\n".join(rows) + "\n")
    return cfg


def test_formatted_clean_passes(formatted_cfg):
    from visual_onoma_to_wave_tpu.data.doctor import check_formatted

    report = check_formatted(formatted_cfg)
    assert report["ok"], report["problems"]
    stats = report["labels"]["drum"]
    # the low-score row is filtered (expected), not a problem
    assert stats == {"rows": 3, "score_filtered": 1, "checked": 2}


def test_formatted_detects_missing_and_mismatched(formatted_cfg):
    from visual_onoma_to_wave_tpu.data.doctor import check_formatted

    root = pathlib.Path(formatted_cfg.path.formatted)
    # remove one wav; corrupt one TextGrid char count (append a bogus row
    # whose text is longer than its TextGrid)
    next(iter((root / "audio" / "drum").glob("*.wav"))).unlink()
    dt = root / "text" / "drum" / "data.txt"
    dt.write_text(dt.read_text() +
                  "c1_drum_000_0980_w1x|c1_drum_001_0980|パンパン|drum|5.0|4.0\n")
    # reuse clip 000's TextGrid name? row name has no TextGrid ->
    # missing-TextGrid problem; plus malformed row
    dt.write_text(dt.read_text() + "bad|row\n")

    report = check_formatted(formatted_cfg)
    assert not report["ok"]
    text = "\n".join(report["problems"])
    assert "missing wav" in text
    assert "missing TextGrid" in text
    assert "fields" in text
