"""Golden tests against the reference repo's COMMITTED dataset metadata
(/root/reference/preprocessed_data/RWCP-SSD/latest — data artifacts, not
code). These pin byte-compatibility of our loaders and the exact behavior
of the split router / vocab builder on the real corpus metadata.

Skipped automatically when the reference checkout is not present.
"""
import pathlib

import pytest

REF = pathlib.Path("/root/reference/preprocessed_data/RWCP-SSD/latest")

pytestmark = pytest.mark.skipif(
    not (REF / "train.txt").exists(),
    reason="reference committed metadata not available")

VALTEST_ID = (13, 33, 53, 73, 93)  # reference config/ICASSP/preprocess.yaml


def test_metadata_loads_reference_artifacts():
    """DatasetMetadata reads the reference's committed json files as-is."""
    from visual_onoma_to_wave_tpu.config import DatasetMetadata

    meta = DatasetMetadata.load(REF)
    assert meta.n_audiotype == 10
    assert meta.max_pixelsize == 102
    assert meta.image_height == 24
    assert set(meta.label_width) == set(meta.audiotype_map)
    assert meta.energy_stats.min < meta.energy_stats.max
    # class mean chars/sec, max char width, min char width per class
    for cps, wmax, wmin in meta.label_width.values():
        assert 0 < cps < 20 and 0 < wmin <= wmax <= 102


def test_split_router_matches_committed_split():
    """_is_traindata reproduces the committed train/val/test routing on
    every row of the real metadata (reference preprocessor.py:359-364)."""
    from visual_onoma_to_wave_tpu.data.preprocess import _is_traindata

    for fn, expect_train in (("train.txt", True), ("val.txt", False),
                             ("test.txt", False)):
        for line in (REF / fn).read_text().splitlines():
            if not line.strip():
                continue
            name = line.split("|")[0]
            assert _is_traindata(name, VALTEST_ID) is expect_train, (fn, name)


def test_committed_split_sizes():
    """Dataset scale from BASELINE.md: 24 360 / 647 / 647."""
    n = {fn: len([l for l in (REF / fn).read_text().splitlines() if l.strip()])
         for fn in ("train.txt", "val.txt", "test.txt")}
    assert n == {"train.txt": 24360, "val.txt": 647, "test.txt": 647}


def test_symbol_map_on_reference_metadata():
    """Vocab = sorted union of chars across splits, ids from 1 (0=PAD),
    matching reference utils/symbols.py:4-17 semantics on the real data."""
    from visual_onoma_to_wave_tpu.data.symbols import build_symbol_map

    sm = build_symbol_map(REF)
    assert min(sm.values()) == 1
    assert sorted(sm.values()) == list(range(1, len(sm) + 1))
    assert list(sm) == sorted(sm)          # insertion order follows sort
    # every text row must be encodable
    from visual_onoma_to_wave_tpu.data.symbols import encode_text
    for fn in ("train.txt", "val.txt", "test.txt"):
        for line in (REF / fn).read_text().splitlines():
            if line.strip():
                encode_text(line.split("|")[4], sm)


def test_augmentation_suffix_conventions():
    """Committed rows use -repeatN / -consecutiveN suffixes; our augmenter
    must produce the same naming (preprocess._repeat_aug/_consecutive_aug)."""
    names = [l.split("|")[0]
             for l in (REF / "train.txt").read_text().splitlines() if l.strip()]
    suffixes = {n.split("-")[-1] for n in names}
    aug = {s for s in suffixes if s.startswith(("repeat", "consecutive"))}
    assert any(s.startswith("repeat") for s in aug)
    assert any(s.startswith("consecutive") for s in aug)
    # repeat counts are 2..3, consecutive insertions 1..5 (preprocess config)
    for s in aug:
        if s.startswith("repeat"):
            assert s in ("repeat2", "repeat3"), s
        else:
            assert s in tuple(f"consecutive{i}" for i in range(1, 6)), s


SAMPLE_PNG = pathlib.Path(
    "/root/reference/sample/ipaexg_24pt_c3-whistle3-000-0271-517-repeat2.png")


@pytest.mark.skipif(not SAMPLE_PNG.exists(),
                    reason="reference sample strip not available")
def test_reference_rendered_strip_geometry():
    """Geometry golden vs a REAL reference-rendered visual-text strip
    (sample/ipaexg_24pt_c3-whistle3-000-0271-517-repeat2.png, the repeat2
    augmentation of whistle3 clip 000-0271-517, text ピィ -> ピィピィ,
    committed in latest/train-or-val rows).

    We cannot reproduce the ipaexg glyph bitmaps (font blob stripped), but
    every geometric property the pipeline depends on is checkable:
      * strip height == fontsize == visual_text.json height (24);
      * repeat2 == exact horizontal 2x tiling of the base render
        (reference _repeataug pastes the base image side by side,
        preprocessor.py:521-527 — our preprocess._repeat_aug/_hconcat does
        the same);
      * base width 53 is consistent with W = ceil(cps * wav_sec * fontsize)
        for whistle3's committed chars/sec mean (label_width.json);
      * the (W+i)//n fair allocation puts the cell boundary where the
        reference's ink actually falls: each glyph's ink columns lie inside
        its allocated cell.
    """
    import json

    import numpy as np
    from PIL import Image

    from visual_onoma_to_wave_tpu.data.renderer import (
        VisualTextRenderer, allocate_character_widths)

    img = np.asarray(Image.open(SAMPLE_PNG).convert("L"))
    H, W = img.shape
    vt = json.load(open(REF / "visual_text.json"))
    assert H == vt["height"][0] == 24

    # repeat2 tiling: the two halves are byte-identical
    assert W % 2 == 0
    base = img[:, : W // 2]
    np.testing.assert_array_equal(base, img[:, W // 2:])

    # base canvas width from the committed whistle3 chars/sec mean:
    # some wav_sec must yield ceil(cps * wav_sec * 24) == 53
    cps = json.load(open(REF / "label_width.json"))["whistle3"][0]
    w_base = W // 2
    lo, hi = (w_base - 1) / (cps * 24), w_base / (cps * 24)
    assert hi > lo > 0  # the consistency window exists (0.527..0.537 s)

    # our renderer reproduces that exact geometry for any wav_sec in it
    r = VisualTextRenderer(fontsize=24, stretching=True, chars_per_sec=cps)
    wav_sec = (lo + hi) / 2
    canvas, widths = r.draw("ピィ", wav_sec=wav_sec)
    assert canvas.size == (w_base, 24)
    assert widths.tolist() == [26, 27] and widths.sum() == w_base
    np.testing.assert_array_equal(
        widths, allocate_character_widths(2, w_base))

    # the reference ink respects those cell boundaries: ピ's columns lie in
    # [0, 26), ィ's in [26, 53)
    ink = np.where((base < 128).sum(0) > 0)[0]
    cell0 = ink[ink < widths[0]]
    cell1 = ink[ink >= widths[0]]
    assert cell0.size > 0 and cell1.size > 0
    # two separate glyphs: a blank gutter straddles the cell boundary
    assert cell0.max() < widths[0] and cell1.min() >= widths[0]

    # and our repeat augmentation reproduces the tiling invariant
    from visual_onoma_to_wave_tpu.data.preprocess import Preprocessor

    tiled = Preprocessor._hconcat([canvas, canvas])
    arr = np.asarray(tiled.convert("L"))
    assert arr.shape == img.shape
    np.testing.assert_array_equal(arr[:, :w_base], arr[:, w_base:])
