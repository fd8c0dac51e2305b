"""Row-level parity of the corpus formatter with reference 01_format.py:
ALL .ono rows are written (filtering is the preprocessor's job), the DCASE
others_score protocol, text normalization, missing-.acc skip behavior, and
that the preprocessor's border check removes exactly the unconfident rows
so the final split is unchanged."""
import json
import pathlib

import numpy as np
import pytest

from visual_onoma_to_wave_tpu.config import config_from_dict
from visual_onoma_to_wave_tpu.data.formatting import (
    _normalize_text, format_rwcpssd)

SR_RAW = 48000


def _write_raw(path: pathlib.Path, n: int = 4800):
    path.parent.mkdir(parents=True, exist_ok=True)
    wav = 0.1 * np.sin(np.linspace(0, 40, n)).astype(np.float32)
    path.write_bytes((wav * 32767).astype("<i2").tobytes())


@pytest.fixture()
def ref_corpus(tmp_path):
    """Reference-layout corpus: jp text root + parallel _lab root, one take
    dir, two clips covering every 01_format.py branch."""
    audio = tmp_path / "RWCP-SSD"
    ono = tmp_path / "RWCPSSD_Onomatopoeia"
    text_root = ono / "RWCP_SSD_Onomatopoeia_jp" / "nospeech" / "drysrc"
    lab_root = ono / "RWCP_SSD_Onomatopoeia_jp_lab" / "nospeech" / "drysrc"
    d = text_root / "b1" / "drum"
    d.mkdir(parents=True)
    (lab_root / "b1" / "drum").mkdir(parents=True)
    _write_raw(audio / "nospeech" / "drysrc" / "b1" / "drum" / "48khz"
               / "071.raw")
    _write_raw(audio / "nospeech" / "drysrc" / "b1" / "drum" / "48khz"
               / "072.raw")
    # clip 071: confident row w/ matching acc, confident row w/o matching
    # acc, unconfident row (self_score 3)
    (d / "071.ono").write_text(
        "w1,0704_118,パン,5\n"
        "w2,0704_119,ドン,4\n"
        "w3,0704_120,カッ_カ,3\n")
    (d / "071.acc").write_text(
        "0704_118,パン,w9,4\n"
        "0704_118,パン,w8,5\n"
        "0704_999,other,w9,1\n")
    for ono_id, n_chars in (("0704_118", 2), ("0704_119", 2),
                            ("0704_120", 3)):
        marks = "".join(f"0.0{5 + i} 0.0{6 + i} X\n" for i in range(n_chars))
        (lab_root / "b1" / "drum" / f"071-{ono_id}.lab").write_text(
            f"0.0 0.05 silB\n{marks}0.09 0.1 silE\n")
    # clip 072: NO .acc file (the particl2/071.acc situation)
    (d / "072.ono").write_text("w1,0704_200,ポン,5\n")
    (lab_root / "b1" / "drum" / "072-0704_200.lab").write_text(
        "0.0 0.05 silB\n0.05 0.08 X\n0.08 0.1 silE\n")

    cfg = config_from_dict({
        "path": {"corpus": str(ono), "formatted": str(tmp_path / "fmt"),
                 "preprocessed": str(tmp_path / "pre"), "font": ""},
        "dataset": {"extract_labels": ["drum"],
                    "confidence_score_border": 3.0,
                    "acceptance_score_border": 2.5},
    })
    return cfg, audio, tmp_path


def test_normalize_text_matches_reference():
    """01_format.py:18-21: sep, altsep, '|', '_' -> '-'."""
    assert _normalize_text("a/b_c|d") == "a-b-c-d"
    assert _normalize_text("0704_118") == "0704-118"


def test_all_rows_written_with_dcase_scores(ref_corpus):
    """Every .ono row lands in data.txt; others_score is '0' (int) for
    self<=3, the acc average for confident rows with matches, '0.0' for
    confident rows without — exactly the reference's str() formatting."""
    cfg, audio, root = ref_corpus
    counts = format_rwcpssd(cfg, audio)
    assert counts == {"drum": 3}  # clip 072 skipped (no .acc)
    rows = (pathlib.Path(cfg.path.formatted) / "text" / "drum" / "data.txt"
            ).read_text().splitlines()
    assert rows == [
        # basename: b1/drum/071 -> b1-drum-071; ono text '_' -> '-'
        "b1-drum-071-0704-118|b1-drum-071|パン|drum|5|4.5",
        "b1-drum-071-0704-119|b1-drum-071|ドン|drum|4|0.0",
        "b1-drum-071-0704-120|b1-drum-071|カッ-カ|drum|3|0",
    ]
    # the skipped clip must not leave an orphan wav behind (the acc check
    # runs BEFORE audio conversion)
    audio_out = pathlib.Path(cfg.path.formatted) / "audio" / "drum"
    assert not (audio_out / "b1-drum-072.wav").exists()
    assert (audio_out / "b1-drum-071.wav").exists()
    # labs renamed from the parallel _lab root
    lab_dir = pathlib.Path(cfg.path.formatted) / "lab" / "drum"
    assert sorted(p.name for p in lab_dir.glob("*.lab")) == [
        "b1-drum-071-0704-118.lab", "b1-drum-071-0704-119.lab",
        "b1-drum-071-0704-120.lab"]
    # audio converted once per clip under the normalized basename
    assert (pathlib.Path(cfg.path.formatted) / "audio" / "drum"
            / "b1-drum-071.wav").exists()


def test_missing_acc_keep_mode(ref_corpus):
    cfg, audio, root = ref_corpus
    counts = format_rwcpssd(cfg, audio, missing_acc="keep")
    assert counts == {"drum": 4}
    rows = (pathlib.Path(cfg.path.formatted) / "text" / "drum" / "data.txt"
            ).read_text().splitlines()
    assert "b1-drum-072-0704-200|b1-drum-072|ポン|drum|5|0.0" in rows
    with pytest.raises(ValueError, match="missing_acc"):
        format_rwcpssd(cfg, audio, missing_acc="bogus")


def test_unconfident_rows_filtered_at_preprocess_not_format(ref_corpus):
    """The self_score<=3 row IS in data.txt but fails the preprocessor's
    acceptance border (others=0 < 2.5), like reference preprocessor.py:
    232-244 — the surviving set is the confident-with-acceptance rows."""
    cfg, audio, root = ref_corpus
    format_rwcpssd(cfg, audio)
    ds = cfg.dataset
    survivors = []
    for line in (pathlib.Path(cfg.path.formatted) / "text" / "drum"
                 / "data.txt").read_text().splitlines():
        name, _a, _t, _l, conf, acc = line.split("|")
        if (float(conf) >= ds.confidence_score_border
                and float(acc) >= ds.acceptance_score_border):
            survivors.append(name)
    assert survivors == ["b1-drum-071-0704-118"]


def test_doctor_formatted_counts_score_filtered(ref_corpus):
    """cli doctor --stage formatted sees the full row set and counts the
    expected score-filter skips separately (comparable across frameworks
    now that data.txt is row-identical)."""
    from visual_onoma_to_wave_tpu.data.doctor import check_formatted
    from visual_onoma_to_wave_tpu.data.labels import prepare_textgrids

    cfg, audio, root = ref_corpus
    format_rwcpssd(cfg, audio)
    prepare_textgrids(cfg.path.formatted, ["drum"])
    report = check_formatted(cfg)
    stats = report["labels"]["drum"]
    assert stats["rows"] == 3
    # 0704-119 (others 0.0) and 0704-120 (self 3 -> others 0) fail borders
    assert stats["score_filtered"] == 2
    assert stats["checked"] == 1
    assert report["ok"], report["problems"]


def test_malformed_rows_raise(ref_corpus):
    cfg, audio, root = ref_corpus
    d = (pathlib.Path(cfg.path.corpus) / "RWCP_SSD_Onomatopoeia_jp"
         / "nospeech" / "drysrc" / "b1" / "drum")
    (d / "071.ono").write_text("w1,onlythree,5\n")
    with pytest.raises(ValueError, match=r"\.ono rows"):
        format_rwcpssd(cfg, audio)
    (d / "071.ono").write_text("w1,0704_118,パン,5\n")
    (d / "071.acc").write_text("bad,row\n")
    with pytest.raises(ValueError, match=r"\.acc rows"):
        format_rwcpssd(cfg, audio)
