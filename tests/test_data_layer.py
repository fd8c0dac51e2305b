"""Unit tests for the host data layer: audio IO, labels, alignment, renderer."""
import numpy as np
import pytest

from visual_onoma_to_wave_tpu.data import (
    Interval,
    align_tier,
    allocate_character_widths,
    pad_character_cells,
    read_lab,
    read_textgrid,
    read_wav,
    resample,
    write_textgrid,
    write_wav,
)


def test_wav_roundtrip(tmp_path, rng):
    x = (rng.uniform(-0.9, 0.9, 22050)).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 22050)
    y, sr = read_wav(p)
    assert sr == 22050
    np.testing.assert_allclose(y, x, atol=2.0 / 32768)


def test_resample_preserves_tone():
    sr0, sr1 = 48000, 22050
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, sr0, sr1)
    assert abs(len(y) - sr1) <= 2
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(y[: sr1]))
    peak_hz = np.argmax(spec) * sr1 / sr1
    assert abs(peak_hz - 440) < 3


def test_read_lab_splits_multichar(tmp_path):
    lab = tmp_path / "x.lab"
    lab.write_text("0.0 0.5 silB\n0.5 1.1 パンパ\n1.1 1.5 ン\n1.5 2.0 silE\n")
    segments, n_chars = read_lab(lab)
    assert n_chars == 4
    texts = [s.text for s in segments]
    assert texts == ["silb", "パ", "ン", "パ", "ン", "sile"]
    # 3-char label split at 1/3 boundaries with 4-dp rounding
    assert segments[1].start == 0.5
    assert segments[1].end == 0.5 + round(0.6 / 3, 4)
    assert segments[3].end == pytest.approx(1.1)


def test_textgrid_roundtrip(tmp_path):
    segs = [Interval(0.0, 0.4, ""), Interval(0.4, 0.9, "パ"), Interval(0.9, 1.3, "ン"),
            Interval(1.3, 1.8, "")]
    p = tmp_path / "x.TextGrid"
    write_textgrid(segs, p)
    back = read_textgrid(p)
    assert [i.text for i in back] == ["", "パ", "ン", ""]
    assert back[1].start == pytest.approx(0.4)
    assert back[2].end == pytest.approx(1.3)


def test_align_tier_durations_sum_to_frames():
    sr, hop = 22050, 256
    intervals = [
        Interval(0.0, 0.30, ""),          # leading sil
        Interval(0.30, 0.80, "パ"),
        Interval(0.80, 1.20, "ン"),
        Interval(1.20, 1.60, ""),         # trailing sil
    ]
    num_samples = int(1.6 * sr)
    al = align_tier(intervals, num_samples, sr, hop, margin_frame=5)
    assert al.characters == ["パ", "ン"]
    assert al.start < 0.30 and al.end > 1.20          # margins applied
    total = int(al.durations.sum())
    expected = round(al.end * sr / hop) - round(al.start * sr / hop)
    assert total == expected


def test_align_tier_margin_clamps_at_zero():
    sr, hop = 22050, 256
    intervals = [Interval(0.0, 0.01, ""), Interval(0.01, 0.5, "ア"),
                 Interval(0.5, 0.8, "")]
    al = align_tier(intervals, int(0.8 * sr), sr, hop, margin_frame=5)
    assert al.start == 0.0


def test_allocate_character_widths_fair_split():
    w = allocate_character_widths(3, 100)
    assert w.tolist() == [33, 33, 34]
    assert w.sum() == 100
    w = allocate_character_widths(4, 102)
    assert w.sum() == 102


def test_pad_character_cells_centering():
    img = np.zeros((4, 10), np.uint8)           # all-black strip
    widths = np.array([4, 6])
    cells = pad_character_cells(img, widths, cell_width=8)
    assert cells.shape == (2, 4, 8)
    # char 0 width 4 -> left pad 2, right pad 2 (even split)
    assert (cells[0, :, 2:6] == 0).all()
    assert (cells[0, :, :2] == 255).all() and (cells[0, :, 6:] == 255).all()
    # char 1 width 6 -> pad 2 total: ceil-left 1, right 1
    assert (cells[1, :, 1:7] == 0).all()
    assert (cells[1, :, 0] == 255).all() and (cells[1, :, 7] == 255).all()


def test_renderer_geometry(tmp_path):
    from visual_onoma_to_wave_tpu.data import VisualTextRenderer

    r = VisualTextRenderer(fontsize=24, chars_per_sec=4.0)
    img, widths = r.draw("パンパン", wav_sec=1.0)
    assert img.height == 24
    assert img.width == int(np.ceil(4.0 * 1.0 * 24))
    assert widths.sum() == img.width
    arr = r.draw_with_width_rates("パン", [1.0, 0.5], cell_width=102)
    assert arr.shape == (24, 204)


def test_renderer_procedural_glyphs_distinct_and_deterministic():
    """With no CJK font installed, distinct katakana must still render as
    DISTINCT (and reproducible) glyphs — the paper's conditioning signal is
    glyph identity (the reference's ipaexg.ttf is a stripped blob, and
    PIL's default font renders all CJK as one tofu box)."""
    from visual_onoma_to_wave_tpu.data.renderer import (
        VisualTextRenderer, _has_glyph)

    assert _has_glyph("", 24, "A")          # latin: real glyph
    assert not _has_glyph("", 24, "パ")     # katakana: fallback engages
    r = VisualTextRenderer(fontsize=24)
    text = "パンドトカ"
    arr = r.draw_with_width_rates(text, [1.0] * len(text))
    cells = arr.reshape(24, len(text), 102)
    sigs = {cells[:, i, :].tobytes() for i in range(len(text))}
    assert len(sigs) == len(text), "glyphs must be distinct per character"
    # same char -> same glyph, across calls and positions
    arr2 = r.draw_with_width_rates(text, [1.0] * len(text))
    np.testing.assert_array_equal(arr, arr2)
    rep = r.draw_with_width_rates("パパ", [1.0, 1.0])
    c = rep.reshape(24, 2, 102)
    np.testing.assert_array_equal(c[:, 0, :], c[:, 1, :])


def test_glyph_source_classification_and_stamp(tmp_path):
    """glyph_source_for_chars classifies a host's rendering of a char set;
    DatasetMetadata round-trips the stamp (ADVICE r2: a model trained on
    procedural glyphs must not silently serve real-font glyphs)."""
    from visual_onoma_to_wave_tpu.config import DatasetMetadata, FeatureStats
    from visual_onoma_to_wave_tpu.data.renderer import glyph_source_for_chars

    # no CJK font in this image: latin covered, katakana procedural
    assert glyph_source_for_chars("", 24, "AB") == "font"
    assert glyph_source_for_chars("", 24, "パンド") == "procedural"
    assert glyph_source_for_chars("", 24, "Aパ") == "mixed"
    assert glyph_source_for_chars("", 24, "") == "font"   # vacuous

    md = DatasetMetadata(
        audiotype_map={"drum": 0},
        energy_stats=FeatureStats(-1, 1, 0, 1),
        kurtosis_stats=FeatureStats(-1, 1, 0, 1),
        max_pixelsize=102, image_height=24, label_width={},
        glyph_source="procedural", font_name="ipaexg")
    md.save(tmp_path)
    back = DatasetMetadata.load(tmp_path)
    assert back.glyph_source == "procedural"
    assert back.font_name == "ipaexg"
    # pre-stamp metadata (no key) loads as None — backward compatible
    import json
    vt = json.loads((tmp_path / "visual_text.json").read_text())
    del vt["glyph_source"], vt["font"]
    (tmp_path / "visual_text.json").write_text(json.dumps(vt))
    assert DatasetMetadata.load(tmp_path).glyph_source is None


def test_glyph_source_mismatch_warns():
    """Synthesizer warns when the serving host would render the vocabulary
    with a different glyph source than the training stamp."""
    import types
    import warnings

    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    def probe(trained_source, use_image=True):
        dummy = types.SimpleNamespace(
            use_image=use_image,
            metadata=types.SimpleNamespace(glyph_source=trained_source,
                                           font_name="ipaexg"),
            config=types.SimpleNamespace(
                path=types.SimpleNamespace(font="")),
            renderer=types.SimpleNamespace(fontsize=24),
            symbol_map={"PAD": 0, "パ": 1, "ン": 2},
        )
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            Synthesizer._check_glyph_source(dummy)
        return [str(x.message) for x in w]

    # this host renders katakana procedurally
    assert any("glyph-source mismatch" in m for m in probe("font"))
    assert probe("procedural") == []       # matching stamp: silent
    assert probe(None) == []               # pre-stamp metadata: silent
    assert probe("font", use_image=False) == []   # text path: irrelevant
