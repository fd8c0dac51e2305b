"""Objective quality metrics (metrics.py): DCT/cepstra correctness, MCD
identities, DTW alignment behavior, and the Trainer.evaluate(metrics=True)
wiring. The reference has no machine-checkable quality metric (its
evaluate.py only logs audio for human listening) — these pin ours."""
import numpy as np
import pytest

from test_trainer_synthesis import tiny_env  # noqa: F401 (fixture reuse)

from visual_onoma_to_wave_tpu.metrics import (
    MCD_K,
    batch_quality_metrics,
    dtw_path,
    mcd_dtw,
    mcd_frames,
    mel_cepstra,
    mel_l1,
)


def test_mel_cepstra_matches_scipy_dct():
    """Our DCT-II basis (orthonormal) equals scipy's, c0 dropped."""
    scipy = pytest.importorskip("scipy")
    from scipy.fftpack import dct

    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 80))
    ours = mel_cepstra(x, n_coeffs=13)
    ref = dct(x, type=2, norm="ortho", axis=-1)[:, 1:14]
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_mcd_identities():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(20, 80))
    assert mcd_frames(a, a) == 0.0
    # the pairwise-distance expansion |x|^2+|y|^2-2xy rounds to ~1e-13,
    # sqrt turns that into ~1e-7 — identical inputs are near-zero, not zero
    assert mcd_dtw(a, a) < 1e-6
    assert mel_l1(a, a) == 0.0
    # a constant offset lives entirely in c0, which MCD excludes
    assert mcd_frames(a + 3.0, a) < 1e-9
    # but mel_l1 sees it
    assert mel_l1(a + 3.0, a) == pytest.approx(3.0)


def test_mcd_known_value():
    """A perturbation along a single DCT basis vector has a closed form:
    per-frame cepstral distance == |amplitude| (orthonormal basis)."""
    from visual_onoma_to_wave_tpu.metrics import _dct_matrix

    M, T, amp = 80, 12, 0.25
    basis = _dct_matrix(M, 13)
    base = np.zeros((T, M))
    pred = base + amp * basis[5]  # c5 direction
    expected = MCD_K * amp
    assert mcd_frames(pred, base) == pytest.approx(expected, rel=1e-9)


def test_mcd_shape_mismatch_raises():
    a, b = np.zeros((10, 80)), np.zeros((12, 80))
    with pytest.raises(ValueError):
        mcd_frames(a, b)
    with pytest.raises(ValueError):
        mel_l1(a, b)


def test_dtw_aligns_time_stretched_copy():
    """A 2x frame-repeated mel DTW-aligns to its original with ~zero
    distortion; a shuffled one does not."""
    rng = np.random.default_rng(2)
    gt = rng.normal(size=(15, 80))
    stretched = np.repeat(gt, 2, axis=0)
    assert mcd_dtw(stretched, gt) < 1e-6
    shuffled = gt[rng.permutation(15)]
    assert mcd_dtw(shuffled, gt) > 1.0


def test_dtw_path_monotone_and_complete():
    rng = np.random.default_rng(3)
    cost = rng.uniform(size=(9, 14))
    pi, pj = dtw_path(cost)
    assert pi[0] == 0 and pj[0] == 0
    assert pi[-1] == 8 and pj[-1] == 13
    assert np.all(np.diff(pi) >= 0) and np.all(np.diff(pj) >= 0)
    assert np.all((np.diff(pi) + np.diff(pj)) >= 1)  # always advances


def test_dtw_is_optimal_on_small_instance():
    """Brute-force check on a tiny cost matrix."""
    cost = np.array([[1.0, 9.0, 9.0],
                     [9.0, 1.0, 9.0],
                     [9.0, 9.0, 1.0]])
    pi, pj = dtw_path(cost)
    # the diagonal is the unique cheap path
    np.testing.assert_array_equal(pi, [0, 1, 2])
    np.testing.assert_array_equal(pj, [0, 1, 2])


def test_batch_quality_metrics_masks_padding():
    rng = np.random.default_rng(4)
    B, T, M = 2, 10, 8
    gt = rng.normal(size=(B, T, M))
    gt_lens = np.array([6, 10])
    tf = gt.copy()
    tf[:, 6:] += 100.0  # corrupt item-0 padding only
    gt_lens_arr = gt_lens
    fr = gt.copy()
    fr_lens = gt_lens.copy()
    sums = batch_quality_metrics(tf, fr, fr_lens, gt, gt_lens_arr)
    # item 0's corrupted frames are beyond its length -> only item 1's
    # (clean) frames count; but tf[1, 6:] was also corrupted and IS inside
    # item 1's length 10, so mel_l1 > 0 while item 0 contributes 0
    per_item_0 = mel_l1(tf[0, :6], gt[0, :6])
    assert per_item_0 == 0.0
    assert sums["mel_l1"] > 0.0
    assert sums["mcd_dtw"] == pytest.approx(0.0, abs=1e-6)


def test_trainer_evaluate_metrics(tiny_env):  # noqa: F811
    """evaluate(metrics=True) returns finite mel_l1/mcd/mcd_dtw alongside
    the losses; evaluate() without metrics keeps the legacy keys only."""
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    trainer = Trainer(tiny_env, use_mesh=False)
    try:
        means = trainer.evaluate(metrics=True)
        for k in ("mel_l1", "mcd", "mcd_voiced", "mcd_dtw"):
            assert k in means and np.isfinite(means[k]), (k, means)
            assert means[k] >= 0.0
        assert "total_loss" in means
        legacy = trainer.evaluate()
        assert "mcd" not in legacy
    finally:
        trainer.ckpt.close()


def test_trainer_evaluate_waveform_metrics(tiny_env):  # noqa: F811
    """With a vocoder loaded AND --save-audio waveforms on disk, evaluate
    (metrics=True) adds the full-stack waveform MR-STFT numbers; without
    audio files the keys are absent (mel-domain metrics only)."""
    import dataclasses
    import pathlib

    import jax
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    cfg = tiny_env.replace(model=dataclasses.replace(
        tiny_env.model, vocoder_kwargs={"upsample_initial_channel": 32}))
    gen = HiFiGANGenerator(upsample_initial_channel=32)
    voc_params = gen.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 4, 80), jnp.float32))

    # no audio/ dir yet -> no waveform keys
    trainer = Trainer(cfg, vocoder_params=voc_params, use_mesh=False)
    try:
        means = trainer.evaluate(metrics=True)
        assert "mrstft_sc" not in means

        # write hop-aligned GT audio for every val row (what preprocess
        # --save-audio produces), then the metric appears and is finite
        root = pathlib.Path(cfg.path.preprocessed)
        hop = cfg.audio.stft.hop_length
        rng = np.random.default_rng(12)
        for split in ("val.txt",):
            for line in (root / split).read_text().splitlines():
                if not line.strip():
                    continue
                name, label = line.split("|")[0], line.split("|")[1]
                T = np.load(root / "mel" / label / f"{name}.npy").shape[0]
                (root / "audio" / label).mkdir(parents=True, exist_ok=True)
                np.save(root / "audio" / label / f"{name}.npy",
                        rng.uniform(-0.5, 0.5, T * hop).astype(np.float32))
        means = trainer.evaluate(metrics=True)
        for k in ("mrstft_sc", "mrstft_mag"):
            assert k in means and np.isfinite(means[k]) and means[k] > 0.0
    finally:
        trainer.ckpt.close()
        import shutil
        shutil.rmtree(pathlib.Path(cfg.path.preprocessed) / "audio",
                      ignore_errors=True)


def test_val_metrics_flag_logs_quality_in_train_loop(tiny_env):  # noqa: F811
    """train.step.val_metrics=True makes the periodic validation log the
    quality metrics to the val metrics stream."""
    import dataclasses
    import json as _json
    import pathlib

    from visual_onoma_to_wave_tpu.training.trainer import Trainer

    cfg = tiny_env.replace(train=dataclasses.replace(
        tiny_env.train, step=dataclasses.replace(
            tiny_env.train.step, total_step=3, val_step=3,
            synth_step=10 ** 9, save_step=10 ** 9, val_metrics=True)))
    trainer = Trainer(cfg, use_mesh=False)
    try:
        trainer.train()
    finally:
        trainer.ckpt.close()
    rows = [_json.loads(l) for l in
            (pathlib.Path(cfg.path.log) / "val" / "metrics.jsonl"
             ).read_text().splitlines()]
    assert any("mcd" in r and np.isfinite(r["mcd"]) for r in rows), rows


def test_stft_magnitude_matches_torch():
    """stft_magnitude (the MR-STFT building block) equals
    torch.stft(center=True, periodic hann) magnitudes, incl. win < n_fft."""
    import torch

    from visual_onoma_to_wave_tpu.metrics import stft_magnitude

    rng = np.random.default_rng(8)
    wav = rng.normal(size=4096).astype(np.float32)
    for n_fft, hop, win in ((512, 128, 512), (1024, 256, 1024),
                            (1024, 256, 600)):
        ours = stft_magnitude(wav, n_fft, hop, win)
        ref = torch.stft(
            torch.from_numpy(wav), n_fft=n_fft, hop_length=hop,
            win_length=win, window=torch.hann_window(win),
            center=True, return_complex=True).abs().numpy().T
        np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_mrstft_identity_and_scaling():
    """Identical waveforms score 0; a 2x-scaled copy has the closed form
    sc = ||S-2S||/||S|| = 1 and log-mag L1 = ln 2 at every resolution."""
    from visual_onoma_to_wave_tpu.metrics import mrstft_distance

    rng = np.random.default_rng(9)
    wav = rng.normal(size=8192) * 0.3
    d0 = mrstft_distance(wav, wav)
    assert d0 == {"sc": 0.0, "mag": 0.0, "total": 0.0}
    d2 = mrstft_distance(2.0 * wav, wav)
    assert d2["sc"] == pytest.approx(1.0, rel=1e-9)
    assert d2["mag"] == pytest.approx(np.log(2.0), rel=1e-6)
    assert d2["total"] == pytest.approx(d2["sc"] + d2["mag"])


def test_mrstft_penalizes_phase_corruption():
    """Two signals with near-identical coarse mel energy but scrambled fine
    structure (tone vs same-band noise) score far worse than a mild
    amplitude error — the de-biasing property vs mel-domain metrics."""
    from visual_onoma_to_wave_tpu.metrics import mrstft_distance

    rng = np.random.default_rng(10)
    t = np.arange(8192) / 22050.0
    tone = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    mild = 1.05 * tone                       # 5% amplitude error
    scrambled = 0.5 * rng.normal(size=t.size) * np.std(tone) * np.sqrt(2)
    assert (mrstft_distance(scrambled, tone)["total"]
            > 5 * mrstft_distance(mild, tone)["total"])


def test_mrstft_length_handling():
    from visual_onoma_to_wave_tpu.metrics import mrstft_distance

    rng = np.random.default_rng(11)
    wav = rng.normal(size=8192)
    # hop slop: a few trailing samples are trimmed, not an error
    d = mrstft_distance(wav[:-7], wav)
    assert d["total"] < 1e-2
    with pytest.raises(ValueError, match="lengths differ"):
        mrstft_distance(wav[:4000], wav)
    with pytest.raises(ValueError, match="non-empty"):
        mrstft_distance(np.zeros(0), np.zeros(0))


def test_native_dtw_matches_python():
    """The C DTW kernel (native/datakernels.c dtw_path_f64) returns the
    exact path of the pure-Python DP on random and adversarial (tie-heavy)
    cost matrices."""
    from visual_onoma_to_wave_tpu import native

    if not native.available():
        pytest.skip("native kernels unavailable")
    rng = np.random.default_rng(5)
    cases = [rng.uniform(size=(40, 55)),
             rng.uniform(size=(55, 40)),
             np.zeros((12, 17)),             # all ties -> tie-break pinned
             np.ones((1, 9)), np.ones((9, 1)),
             rng.integers(0, 3, (30, 30)).astype(np.float64)]  # many ties
    for cost in cases:
        pi_c, pj_c = native.dtw_path_f64(cost)
        pi_p, pj_p = dtw_path(cost)
        np.testing.assert_array_equal(pi_c, pi_p)
        np.testing.assert_array_equal(pj_c, pj_p)


def test_native_dtw_rejects_degenerate():
    from visual_onoma_to_wave_tpu import native

    if not native.available():
        pytest.skip("native kernels unavailable")
    with pytest.raises(ValueError):
        native.dtw_path_f64(np.zeros((0, 5)))


def test_voiced_mcd_scores_signal_not_silence():
    """mcd_voiced ignores floor-silence frames: corrupting ONLY silence
    frames moves mcd but not mcd_voiced; corrupting voiced frames moves
    both."""
    from visual_onoma_to_wave_tpu.metrics import (
        MEL_FLOOR, batch_quality_metrics, voiced_mask)

    rng = np.random.default_rng(7)
    T, M = 20, 16
    gt = np.full((1, T, M), MEL_FLOOR)
    gt[0, 5:10] = rng.uniform(-2.0, 0.0, (5, M))   # 5 voiced frames
    assert voiced_mask(gt[0]).sum() == 5
    lens = np.array([T])

    spectral = np.where(np.arange(M) % 2 == 0, 2.0, -2.0)  # not in c0
    tf_silence_bad = gt.copy()
    tf_silence_bad[0, 12:15] += spectral           # corrupt silence only
    q1 = batch_quality_metrics(tf_silence_bad, gt, lens, gt, lens)
    assert q1["mcd"] > 1.0
    assert q1["mcd_voiced"] < 1e-9

    tf_voiced_bad = gt.copy()
    tf_voiced_bad[0, 6:8] += spectral              # corrupt voiced frames
    q2 = batch_quality_metrics(tf_voiced_bad, gt, lens, gt, lens)
    assert q2["mcd_voiced"] > 1.0

    # an all-silence item falls back to all-frame MCD (never NaN)
    gt_sil = np.full((1, T, M), MEL_FLOOR)
    q3 = batch_quality_metrics(gt_sil, gt_sil, lens, gt_sil, lens)
    assert np.isfinite(q3["mcd_voiced"])
