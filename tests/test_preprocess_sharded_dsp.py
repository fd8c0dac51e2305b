"""Multi-device preprocessing DSP: on a multi-chip host the clip-feature
batch is sharded over a data mesh so every chip works through
preprocessing (VERDICT r2 #5). 1-vs-N equality on the virtual 8-CPU mesh,
for both the jnp path (GSPMD-partitioned) and the Pallas path
(shard_map-wrapped, interpret mode here)."""
import numpy as np
import pytest

from visual_onoma_to_wave_tpu.config import Config
from visual_onoma_to_wave_tpu.data.preprocess import (
    _UNSET,
    Preprocessor,
    _sharded_pallas_features,
)


@pytest.fixture
def pre(tmp_path):
    cfg = Config()
    cfg = cfg.replace(path=cfg.path.__class__(
        formatted=str(tmp_path / "f"), preprocessed=str(tmp_path / "p"),
        font=""))
    return Preprocessor(cfg)


def _clips(n, sr=22050, seed=0):
    rng = np.random.default_rng(seed)
    audios, durs = [], []
    for i in range(n):
        L = sr // 2 + 256 * (i % 5)
        audios.append(rng.uniform(-0.5, 0.5, L).astype(np.float32))
        T = (L // 256) + 1
        c = 2 + i % 3
        d = np.full(c, T // c, np.int32)
        d[-1] = T - d[:-1].sum()
        durs.append(d)
    return audios, durs


def test_dsp_mesh_detected_on_multi_device_host(pre):
    import jax

    assert len(jax.devices()) >= 8  # conftest virtual devices
    mesh = pre._get_dsp_mesh()
    assert mesh is not None and mesh.size == len(jax.devices())
    # CPU-fallback path is single-device by definition
    pre2 = Preprocessor(pre.config)
    pre2._dsp_cpu = True
    assert pre2._get_dsp_mesh() is None


def test_sharded_dsp_equals_single_device(pre):
    """Feature outputs are identical whether the batch is sharded over the
    8-device mesh or dispatched to one device (jnp path)."""
    audios, durs = _clips(12)  # 12 clips -> padded to 16 over 8 devices
    sharded = pre._features_finalize(
        pre._features_dispatch(audios, durs), durs)

    pre1 = Preprocessor(pre.config)
    pre1._dsp_mesh = None  # force single-device dispatch
    single = pre1._features_finalize(
        pre1._features_dispatch(audios, durs), durs)

    assert len(sharded) == len(single) == len(audios)
    for (lm_a, e_a, k_a), (lm_b, e_b, k_b) in zip(sharded, single):
        np.testing.assert_allclose(lm_a, lm_b, atol=1e-5)
        np.testing.assert_allclose(e_a, e_b, atol=1e-5)
        np.testing.assert_allclose(k_a, k_b, atol=1e-5)


def test_sharded_pallas_features_semantics(pre):
    """The shard_map-wrapped Pallas path (interpret mode on the CPU mesh)
    matches the unsharded interpret kernel — partitioning over the batch
    axis must not change any value (embarrassingly parallel, no
    collectives). Mosaic tiling rules are NOT checked here (interpret
    mode); the kernel itself is compile-checked on real TPU by
    tests/test_pallas_mel.py's native runs."""
    import jax.numpy as jnp

    from visual_onoma_to_wave_tpu.data.preprocess import MAX_CHARS
    from visual_onoma_to_wave_tpu.ops.pallas_mel import pallas_clip_features

    mesh = pre._get_dsp_mesh()
    assert mesh is not None
    sr, n_fft, hop, win = 22050, 1024, 256, 1024
    rng = np.random.default_rng(1)
    B = mesh.size * 2
    L = n_fft + 32 * hop  # one bucket unit
    audio = rng.uniform(-1, 1, (B, L)).astype(np.float32)
    durs = np.zeros((B, MAX_CHARS), np.int32)
    durs[:, :2] = 16

    got = _sharded_pallas_features(
        mesh, jnp.asarray(audio), jnp.asarray(durs), MAX_CHARS,
        n_fft, hop, win, 80, sr, 0.0, 8000.0)
    want = pallas_clip_features(
        jnp.asarray(audio), jnp.asarray(durs), MAX_CHARS, n_fft, hop, win,
        80, sr, 0.0, 8000.0, interpret=True)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-5)


def test_mesh_padding_rows_do_not_leak(pre):
    """A batch whose size is NOT a mesh multiple pads with zero rows; the
    finalize slicing must return exactly the real clips."""
    audios, durs = _clips(3, seed=2)  # 3 -> padded to 8
    out = pre._features_finalize(pre._features_dispatch(audios, durs), durs)
    assert len(out) == 3
    for (lm, e, k), d in zip(out, durs):
        assert lm.shape[0] == int(d.sum())  # (T, n_mels) per clip
        assert e.shape == (len(d),) and k.shape == (len(d),)
        assert np.isfinite(lm).all() and np.isfinite(e).all()
