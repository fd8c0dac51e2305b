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
