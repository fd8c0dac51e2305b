"""Host-parallel preprocessing policies: pool selection gating and the
adaptive DSP-backend controls (reference joblib n_jobs analog,
preprocessor.py:64-66)."""
import os

import numpy as np
import pytest

from visual_onoma_to_wave_tpu.config import Config
from visual_onoma_to_wave_tpu.data.preprocess import (
    MIN_CLIPS_FOR_PROCS,
    Preprocessor,
)


@pytest.fixture
def pre(tmp_path):
    cfg = Config()
    cfg = cfg.replace(path=cfg.path.__class__(
        formatted=str(tmp_path / "f"), preprocessed=str(tmp_path / "p"),
        font=""))
    return Preprocessor(cfg)


def test_make_pool_uses_threads_on_few_cores(pre, monkeypatch):
    monkeypatch.setattr(os, "sched_getaffinity", lambda _: {0, 1},
                        raising=False)
    pool, kind = pre._make_pool(10 * MIN_CLIPS_FOR_PROCS)
    try:
        assert kind == "thread"
    finally:
        pool.shutdown()


def test_make_pool_uses_threads_for_small_corpora(pre, monkeypatch):
    monkeypatch.setattr(os, "sched_getaffinity", lambda _: set(range(16)),
                        raising=False)
    pool, kind = pre._make_pool(MIN_CLIPS_FOR_PROCS - 1)
    try:
        assert kind == "thread"
    finally:
        pool.shutdown()


def test_make_pool_single_worker(pre):
    pool, kind = Preprocessor(pre.config, num_workers=1)._make_pool(10_000)
    try:
        assert kind == "thread"
    finally:
        pool.shutdown()


def test_dsp_backend_env_override(pre, monkeypatch):
    # on the CPU test platform, forcing "cpu" is a no-op (already local)
    monkeypatch.setenv("VOW_DSP_BACKEND", "cpu")
    pre._maybe_probe_dsp_backend([], 10_000, verbose=False)
    assert pre._dsp_cpu is False
    monkeypatch.setenv("VOW_DSP_BACKEND", "device")
    pre._maybe_probe_dsp_backend([], 10_000, verbose=False)
    assert pre._dsp_cpu is False


def test_probe_skipped_below_threshold(pre):
    pre._maybe_probe_dsp_backend([], total_clips=8, verbose=False)
    assert pre._dsp_cpu is False


def test_augment_in_memory_matches_disk_fallback(tmp_path):
    """_augment with in-memory small features must write byte-identical
    artifacts to the _load_features disk fallback."""
    from PIL import Image

    cfg = Config()
    cfg = cfg.replace(path=cfg.path.__class__(
        formatted=str(tmp_path / "f"), preprocessed=str(tmp_path / "p"),
        font=""))
    rng = np.random.default_rng(0)
    label, base = "drum", "f_24pt_c1-drum-000-x"
    text = "パンン"   # no 3-run; repeat + firstconsecutive fire
    dur = np.array([8, 9, 7], np.int32)
    energy = rng.standard_normal(3).astype(np.float32)
    kurt = rng.standard_normal(3).astype(np.float32)
    width = np.array([10, 12, 11], np.int32)
    mel = rng.standard_normal((int(dur.sum()), 16)).astype(np.float32)
    img = Image.fromarray(
        rng.integers(0, 255, (24, int(width.sum()), 3), np.uint8))

    def write_base(pre):
        for d in ("duration", "energy", "kurtosis", "mel"):
            (pre.out / d / label).mkdir(parents=True, exist_ok=True)
        (pre.out / "image" / "png" / label).mkdir(parents=True, exist_ok=True)
        (pre.out / "image" / "width" / label).mkdir(parents=True, exist_ok=True)
        np.save(pre.out / "duration" / label / f"{base}.npy", dur)
        np.save(pre.out / "energy" / label / f"{base}.npy", energy)
        np.save(pre.out / "kurtosis" / label / f"{base}.npy", kurt)
        np.save(pre.out / "mel" / label / f"{base}.npy", mel)
        img.save(pre.out / "image" / "png" / label / f"{base}.png")
        np.save(pre.out / "image" / "width" / label / f"{base}.npy", width)

    cfg_a = cfg.replace(path=cfg.path.__class__(
        formatted=str(tmp_path / "f"), preprocessed=str(tmp_path / "pa"),
        font=""))
    cfg_b = cfg.replace(path=cfg.path.__class__(
        formatted=str(tmp_path / "f"), preprocessed=str(tmp_path / "pb"),
        font=""))
    pa, pb = Preprocessor(cfg_a), Preprocessor(cfg_b)
    write_base(pa)
    write_base(pb)
    fa, rows_a, norm_a = pa._augment(label, base, text, dur, energy, kurt,
                                     width)
    fb, rows_b, norm_b = pb._augment(label, base, text)   # disk fallback
    assert fa == fb and len(rows_a) == len(rows_b) > 0
    assert [r[2] for r in rows_a] == [r[2] for r in rows_b]
    for mel_p in sorted((pa.out / "mel" / label).glob("*.npy")):
        if mel_p.stem == base:
            continue
        other = pb.out / "mel" / label / mel_p.name
        np.testing.assert_array_equal(np.load(mel_p), np.load(other))
        for feat in ("duration", "energy", "kurtosis"):
            np.testing.assert_array_equal(
                np.load(pa.out / feat / label / mel_p.name),
                np.load(pb.out / feat / label / mel_p.name))
