"""Shape/mask/branch invariants for the VTTS acoustic model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.config import Config
from visual_onoma_to_wave_tpu.models import VTTS, slice_image_to_cells


B, C, T, H, WC = 2, 6, 64, 24, 102


@pytest.fixture(scope="module")
def model():
    cfg = Config()
    return VTTS.from_config(cfg, n_vocab=40, max_mel_len=T)


@pytest.fixture(scope="module")
def batch(model):
    rng = np.random.default_rng(0)
    texts = np.zeros((B, C), np.int32)
    texts[0, :4] = rng.integers(1, 40, 4)
    texts[1, :6] = rng.integers(1, 40, 6)
    src_lens = np.array([4, 6], np.int32)
    durations = np.zeros((B, C), np.int32)
    durations[0, :4] = [5, 10, 3, 7]      # sums 25
    durations[1, :6] = [8, 8, 8, 8, 8, 8]  # sums 48
    energies = rng.standard_normal((B, C)).astype(np.float32)
    kurts = rng.standard_normal((B, C)).astype(np.float32)
    cells = rng.uniform(0, 1, (B, C, H, WC)).astype(np.float32)
    audiotypes = np.array([3, 7], np.int32)
    return dict(
        audiotypes=jnp.asarray(audiotypes), texts=jnp.asarray(texts),
        src_lens=jnp.asarray(src_lens), image_cells=jnp.asarray(cells),
        energy_targets=jnp.asarray(energies), kurtosis_targets=jnp.asarray(kurts),
        duration_targets=jnp.asarray(durations),
    )


@pytest.fixture(scope="module")
def params(model, batch):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, use_image=True, deterministic=True,
    )
    return variables


def test_train_mode_shapes(model, batch, params):
    out = model.apply(params, **batch, use_image=True, deterministic=True)
    assert out["mel"].shape == (B, T, 80)
    assert out["postnet_mel"].shape == (B, T, 80)
    assert out["energy_pred"].shape == (B, C)
    assert out["kurtosis_pred"] is None  # ICASSP config: kurtosis off
    assert out["log_duration_pred"].shape == (B, C)
    np.testing.assert_array_equal(np.asarray(out["mel_lens"]), [25, 48])


def test_masks_consistent(model, batch, params):
    out = model.apply(params, **batch, use_image=True, deterministic=True)
    src_mask = np.asarray(out["src_pad_mask"])
    assert src_mask[0, 4:].all() and not src_mask[0, :4].any()
    mel_mask = np.asarray(out["mel_pad_mask"])
    assert mel_mask[0, 25:].all() and not mel_mask[0, :25].any()
    # predictions at padded positions are zero
    assert np.abs(np.asarray(out["log_duration_pred"])[0, 4:]).sum() == 0


def test_text_embedding_path(model, batch, params):
    """use_image=False must run off texts via the embedding table."""
    b = {k: v for k, v in batch.items() if k != "image_cells"}
    variables = model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        **b, image_cells=None, use_image=False, deterministic=True,
    )
    out = model.apply(variables, **b, image_cells=None, use_image=False,
                      deterministic=True)
    assert out["mel"].shape == (B, T, 80)


def test_inference_mode_predicts_durations(model, batch, params):
    b = {k: v for k, v in batch.items()
         if k not in ("energy_targets", "kurtosis_targets", "duration_targets")}
    out = model.apply(params, **b, use_image=True, deterministic=True)
    d = np.asarray(out["duration_rounded"])
    assert (d >= 0).all()
    # padded chars predict zero duration
    assert d[0, 4:].sum() == 0
    assert np.asarray(out["mel_lens"]).shape == (B,)


def test_dropout_changes_output_in_train(model, batch, params):
    # mutable batch_stats for BatchNorm in train mode
    out1, _ = model.apply(
        params, **batch, use_image=True, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(10)}, mutable=["batch_stats"],
    )
    out2, _ = model.apply(
        params, **batch, use_image=True, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(11)}, mutable=["batch_stats"],
    )
    assert np.abs(np.asarray(out1["mel"]) - np.asarray(out2["mel"])).max() > 0


def test_slice_image_to_cells_stride1():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, H, 4 * WC)).astype(np.float32)
    cells = np.asarray(slice_image_to_cells(jnp.asarray(img), WC, stride=1))
    assert cells.shape == (1, 4, H, WC)
    np.testing.assert_allclose(cells[0, 2], img[0, :, 2 * WC : 3 * WC])


def test_param_count_reasonable(model, params):
    n = sum(np.prod(p.shape) for p in jax.tree.leaves(params["params"]))
    # reference reports ~28M params at startup (SURVEY.md §2); the visual-text
    # configuration should land in the same ballpark
    assert 10e6 < n < 60e6, f"param count {n}"


def test_kurtosis_conditioned_model(batch):
    """The optional kurtosis predictor/embedding path (model.yaml
    is_kurtosis_condition, off in the ICASSP config) trains and infers."""
    m = VTTS(n_vocab=40, n_audiotype=10, hidden=32, encoder_layers=1,
             decoder_layers=1, n_head=2, d_inner=64, ffn_kernel=(3, 1),
             max_seq_len=64, max_mel_len=T, n_mels=80, vfe_layers=1,
             is_energy=True, is_kurtosis=True, vp_filter=32,
             energy_stats=(-2.0, 2.0, 0.0, 1.0),
             kurtosis_stats=(1.0, 90.0, 10.0, 5.0),
             kurtosis_quantization="log")
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, use_image=True, deterministic=True)
    out = m.apply(variables, **batch, use_image=True, deterministic=True)
    assert out["kurtosis_pred"].shape == (B, C)
    assert np.isfinite(np.asarray(out["kurtosis_pred"])).all()
    assert "kurtosis_predictor" in variables["params"]["variance_adaptor"]
    # inference branch (no targets) uses de/re-normalized predictions
    infer_in = {k: v for k, v in batch.items()
                if k not in ("energy_targets", "kurtosis_targets",
                             "duration_targets")}
    out = m.apply(variables, **infer_in, use_image=True, deterministic=True)
    assert np.isfinite(np.asarray(out["postnet_mel"])).all()


def test_rgb_scale_vfe_path(batch):
    """scale_in_training: RGB-scale -> VFE runs 3-channel convs; grayscale
    cells are channel-replicated like PIL convert('RGB') in the reference."""
    cfg = Config()
    cfg = cfg.replace(visual_text=cfg.visual_text.__class__(
        scale_in_training="RGB-scale"))
    m = VTTS.from_config(cfg, n_vocab=40, max_mel_len=T)
    assert m.vfe_channels == 3
    variables = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        **batch, use_image=True, deterministic=True)
    assert variables["params"]["vfe"]["conv_0"]["kernel"].shape[-2:] == (3, 3)
    # bridge input width scales with channels (W*H*3)
    bw = variables["params"]["vfe"]["bridge"]["kernel"].shape[0]
    assert bw == WC * H * 3
    out = m.apply(variables, **batch, use_image=True, deterministic=True)
    assert np.isfinite(np.asarray(out["postnet_mel"])).all()
