"""Acoustic torch->flax checkpoint converter tests.

Strategy (mirrors tests/test_hifigan.py): build a random state_dict in the
reference's exact key layout (scripts/model/vtts.py module tree), convert,
and check (a) the full parameter tree matches our VTTS init structurally,
(b) sample-exact forwards of functional torch transcriptions for every
weight-layout class: FFT block (Linear + Conv1d + LayerNorm), variance
predictor, PostNet (Conv1d + BatchNorm1d), VFE (Conv2d + BatchNorm2d +
bridge Linear), mel_linear.
"""
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from visual_onoma_to_wave_tpu.models import VTTS
from visual_onoma_to_wave_tpu.models.convert_acoustic import (
    convert_vtts_state_dict,
)

H = 32          # hidden (shrunk from 256)
HEADS = 2
DINNER = 64
ENC_L, DEC_L = 2, 2
VFE_L = 2
NPOST = 5
NVOCAB = 16
NAUDIO = 4
CELL_W, CELL_H = 30, 24


def _t(rng, *shape):
    return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.1)


def make_state(rng, vfe_ch: int = 1) -> dict:
    s = {}

    def lin(p, o, i):
        s[f"{p}.weight"] = _t(rng, o, i)
        s[f"{p}.bias"] = _t(rng, o)

    def conv1d(p, o, i, k):
        s[f"{p}.weight"] = _t(rng, o, i, k)
        s[f"{p}.bias"] = _t(rng, o)

    def conv2d(p, o, i, kh, kw):
        s[f"{p}.weight"] = _t(rng, o, i, kh, kw)
        s[f"{p}.bias"] = _t(rng, o)

    def ln(p, d):
        s[f"{p}.weight"] = torch.ones(d) + _t(rng, d)
        s[f"{p}.bias"] = _t(rng, d)

    def bn(p, d):
        s[f"{p}.weight"] = torch.ones(d) + _t(rng, d)
        s[f"{p}.bias"] = _t(rng, d)
        s[f"{p}.running_mean"] = _t(rng, d)
        s[f"{p}.running_var"] = torch.ones(d) + 0.1 * torch.abs(_t(rng, d))

    def fft_stack(prefix, n):
        for i in range(n):
            lp = f"{prefix}.layer_stack.{i}"
            for nm in ("w_qs", "w_ks", "w_vs"):
                lin(f"{lp}.slf_attn.{nm}", H, H)
            lin(f"{lp}.slf_attn.fc", H, H)
            ln(f"{lp}.slf_attn.layer_norm", H)
            conv1d(f"{lp}.pos_ffn.w_1", DINNER, H, 9)
            conv1d(f"{lp}.pos_ffn.w_2", H, DINNER, 1)
            ln(f"{lp}.pos_ffn.layer_norm", H)

    def vp(prefix):
        conv1d(f"{prefix}.conv_layer.conv1d_1.conv", H, H, 3)
        ln(f"{prefix}.conv_layer.layer_norm_1", H)
        conv1d(f"{prefix}.conv_layer.conv1d_2.conv", H, H, 3)
        ln(f"{prefix}.conv_layer.layer_norm_2", H)
        lin(f"{prefix}.linear_layer", 1, H)

    s["encoder.src_word_emb.weight"] = _t(rng, NVOCAB + 1, H)
    for i in range(VFE_L):
        conv2d(f"encoder.VisualFeatureExtractor.embedder.{3 * i}",
               vfe_ch, vfe_ch, 3, 3)
        bn(f"encoder.VisualFeatureExtractor.embedder.{3 * i + 1}", vfe_ch)
    lin("encoder.VisualFeatureExtractor.bridge.0", H,
        vfe_ch * CELL_W * CELL_H)
    fft_stack("encoder", ENC_L)
    s["audiotype_emb.weight"] = _t(rng, NAUDIO, H)
    vp("variance_adaptor.duration_predictor")
    vp("variance_adaptor.energy_predictor")
    s["variance_adaptor.energy_embedding.weight"] = _t(rng, 256, H)
    vp("variance_adaptor.kurtosis_predictor")
    s["variance_adaptor.kurt_embedding.weight"] = _t(rng, 256, H)
    fft_stack("decoder", DEC_L)
    lin("mel_linear", 80, H)
    for i in range(NPOST):
        cin = 80 if i == 0 else 512
        cout = 80 if i == NPOST - 1 else 512
        conv1d(f"postnet.convolutions.{i}.0.conv", cout, cin, 5)
        bn(f"postnet.convolutions.{i}.1", cout)
    return s


def _model():
    return VTTS(n_vocab=NVOCAB, n_audiotype=NAUDIO, hidden=H,
                encoder_layers=ENC_L, decoder_layers=DEC_L, n_head=HEADS,
                d_inner=DINNER, ffn_kernel=(9, 1), max_seq_len=64,
                max_mel_len=64, n_mels=80, vfe_layers=VFE_L,
                vfe_kernel=(3, 3), is_energy=True, is_kurtosis=True,
                vp_filter=H, energy_stats=(-2.0, 2.0, 0.0, 1.0),
                kurtosis_stats=(1.0, 90.0, 10.0, 5.0))


def _convert(state):
    return convert_vtts_state_dict(
        {k: v.numpy() for k, v in state.items()},
        encoder_layers=ENC_L, decoder_layers=DEC_L, vfe_layers=VFE_L,
        postnet_convs=NPOST)


def test_converted_tree_matches_init_structure():
    rng = np.random.default_rng(0)
    variables = _convert(make_state(rng))

    model = _model()
    B, C = 2, 4
    init = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        audiotypes=np.zeros((B,), np.int32),
        texts=np.ones((B, C), np.int32),
        src_lens=np.full((B,), C, np.int32),
        image_cells=np.zeros((B, C, CELL_H, CELL_W), np.float32),
        energy_targets=np.zeros((B, C), np.float32),
        kurtosis_targets=np.full((B, C), 5.0, np.float32),
        duration_targets=np.full((B, C), 8, np.int32),
        use_image=True, deterministic=True)

    def paths(tree):
        return {jax.tree_util.keystr(p): v.shape
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    got_p, want_p = paths(variables["params"]), paths(init["params"])
    # src_word_emb exists only on the text path; validate it separately
    emb = {k: v for k, v in got_p.items() if "src_word_emb" in k}
    assert emb == {"['src_word_emb']['embedding']": (NVOCAB + 1, H)}
    got_p = {k: v for k, v in got_p.items() if "src_word_emb" not in k}
    assert got_p == want_p, (
        set(got_p) ^ set(want_p),
        {k: (got_p.get(k), want_p.get(k))
         for k in got_p if got_p.get(k) != want_p.get(k)})
    assert paths(variables["batch_stats"]) == paths(init["batch_stats"])

    # converted weights must run through the full model
    out = model.apply(
        variables,
        audiotypes=np.zeros((B,), np.int32),
        texts=np.ones((B, C), np.int32),
        src_lens=np.full((B,), C, np.int32),
        image_cells=np.zeros((B, C, CELL_H, CELL_W), np.float32),
        energy_targets=np.zeros((B, C), np.float32),
        kurtosis_targets=np.full((B, C), 5.0, np.float32),
        duration_targets=np.full((B, C), 8, np.int32),
        use_image=True, deterministic=True)
    assert np.isfinite(np.asarray(out["postnet_mel"])).all()


def _torch_fft_block(s, lp, x):
    """Functional transcription of reference FFTBlock (Layers.py:11-30,
    SubLayers.py) without masking (test uses full-length sequences)."""
    B, T, _ = x.shape
    residual = x
    q = (x @ s[f"{lp}.slf_attn.w_qs.weight"].T + s[f"{lp}.slf_attn.w_qs.bias"])
    k = (x @ s[f"{lp}.slf_attn.w_ks.weight"].T + s[f"{lp}.slf_attn.w_ks.bias"])
    v = (x @ s[f"{lp}.slf_attn.w_vs.weight"].T + s[f"{lp}.slf_attn.w_vs.bias"])
    dk = H // HEADS
    q = q.view(B, T, HEADS, dk).permute(0, 2, 1, 3)
    k = k.view(B, T, HEADS, dk).permute(0, 2, 1, 3)
    v = v.view(B, T, HEADS, dk).permute(0, 2, 1, 3)
    attn = torch.softmax(q @ k.transpose(-1, -2) / dk ** 0.5, dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(B, T, H)
    out = out @ s[f"{lp}.slf_attn.fc.weight"].T + s[f"{lp}.slf_attn.fc.bias"]
    x = F.layer_norm(out + residual, (H,),
                     s[f"{lp}.slf_attn.layer_norm.weight"],
                     s[f"{lp}.slf_attn.layer_norm.bias"])
    residual = x
    h = F.conv1d(x.transpose(1, 2), s[f"{lp}.pos_ffn.w_1.weight"],
                 s[f"{lp}.pos_ffn.w_1.bias"], padding=4)
    h = F.conv1d(F.relu(h), s[f"{lp}.pos_ffn.w_2.weight"],
                 s[f"{lp}.pos_ffn.w_2.bias"]).transpose(1, 2)
    return F.layer_norm(h + residual, (H,),
                        s[f"{lp}.pos_ffn.layer_norm.weight"],
                        s[f"{lp}.pos_ffn.layer_norm.bias"])


def test_fft_stack_forward_parity():
    rng = np.random.default_rng(1)
    state = make_state(rng)
    variables = _convert(state)

    B, T = 2, 6
    x = rng.standard_normal((B, T, H)).astype(np.float32)

    tx = torch.tensor(x)
    for i in range(ENC_L):
        tx = _torch_fft_block(state, f"encoder.layer_stack.{i}", tx)
    golden = tx.detach().numpy()

    from visual_onoma_to_wave_tpu.models.vtts import FFTStack
    stack = FFTStack(ENC_L, H, HEADS, DINNER, (9, 1), 0.0)
    pad = np.zeros((B, T), bool)
    ours = stack.apply({"params": variables["params"]["encoder"]},
                       jnp.asarray(x), jnp.asarray(pad), True)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-5)


def test_variance_predictor_and_postnet_parity():
    rng = np.random.default_rng(2)
    state = make_state(rng)
    variables = _convert(state)

    B, T = 2, 6
    x = rng.standard_normal((B, T, H)).astype(np.float32)
    # ---- variance predictor (reference modules.py:161-213) ----
    p = "variance_adaptor.duration_predictor"
    h = torch.tensor(x)
    h = F.conv1d(h.transpose(1, 2), state[f"{p}.conv_layer.conv1d_1.conv.weight"],
                 state[f"{p}.conv_layer.conv1d_1.conv.bias"], padding=1).transpose(1, 2)
    h = F.layer_norm(F.relu(h), (H,), state[f"{p}.conv_layer.layer_norm_1.weight"],
                     state[f"{p}.conv_layer.layer_norm_1.bias"])
    h = F.conv1d(h.transpose(1, 2), state[f"{p}.conv_layer.conv1d_2.conv.weight"],
                 state[f"{p}.conv_layer.conv1d_2.conv.bias"], padding=1).transpose(1, 2)
    h = F.layer_norm(F.relu(h), (H,), state[f"{p}.conv_layer.layer_norm_2.weight"],
                     state[f"{p}.conv_layer.layer_norm_2.bias"])
    golden = (h @ state[f"{p}.linear_layer.weight"].T
              + state[f"{p}.linear_layer.bias"])[..., 0].detach().numpy()

    from visual_onoma_to_wave_tpu.models.layers import VariancePredictor
    vp = VariancePredictor(filter_size=H, kernel_size=3, dropout=0.0)  # noqa
    ours = vp.apply(
        {"params": variables["params"]["variance_adaptor"]["duration_predictor"]},
        jnp.asarray(x), jnp.zeros((B, T), bool), True)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-5)

    # ---- postnet (reference Layers.py:67-137, eval mode) ----
    mel = rng.standard_normal((B, T, 80)).astype(np.float32)
    th = torch.tensor(mel).transpose(1, 2)
    for i in range(NPOST):
        th = F.conv1d(th, state[f"postnet.convolutions.{i}.0.conv.weight"],
                      state[f"postnet.convolutions.{i}.0.conv.bias"], padding=2)
        th = F.batch_norm(th, state[f"postnet.convolutions.{i}.1.running_mean"],
                          state[f"postnet.convolutions.{i}.1.running_var"],
                          state[f"postnet.convolutions.{i}.1.weight"],
                          state[f"postnet.convolutions.{i}.1.bias"], False)
        if i < NPOST - 1:
            th = torch.tanh(th)
    golden = th.transpose(1, 2).detach().numpy()

    from visual_onoma_to_wave_tpu.models.layers import PostNet
    pn = PostNet(n_mel_channels=80, dropout=0.0)
    ours = pn.apply(
        {"params": variables["params"]["postnet"],
         "batch_stats": variables["batch_stats"]["postnet"]},
        jnp.asarray(mel), True)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=1e-4)


def test_vfe_forward_parity():
    rng = np.random.default_rng(3)
    state = make_state(rng)
    variables = _convert(state)

    B, C = 2, 3
    cells = rng.uniform(0, 1, (B, C, CELL_H, CELL_W)).astype(np.float32)
    # torch transcription (reference visual_feature_extractor.py, eval mode)
    tx = torch.tensor(cells.reshape(B * C, 1, CELL_H, CELL_W))
    for i in range(VFE_L):
        p = f"encoder.VisualFeatureExtractor.embedder.{3 * i}"
        tx = F.conv2d(tx, state[f"{p}.weight"], state[f"{p}.bias"], padding=1)
        q = f"encoder.VisualFeatureExtractor.embedder.{3 * i + 1}"
        tx = F.batch_norm(tx, state[f"{q}.running_mean"],
                          state[f"{q}.running_var"], state[f"{q}.weight"],
                          state[f"{q}.bias"], False)
        tx = F.relu(tx)
    tx = tx.reshape(B * C, -1)
    tx = F.relu(tx @ state["encoder.VisualFeatureExtractor.bridge.0.weight"].T
                + state["encoder.VisualFeatureExtractor.bridge.0.bias"])
    golden = tx.reshape(B, C, H).detach().numpy()

    from visual_onoma_to_wave_tpu.models.vfe import VisualFeatureExtractor
    vfe = VisualFeatureExtractor(embed_dim=H, kernel_size=(3, 3),
                                 num_convolutions=VFE_L)
    ours = vfe.apply(
        {"params": variables["params"]["vfe"],
         "batch_stats": variables["batch_stats"]["vfe"]},
        jnp.asarray(cells), True)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-5)


def test_vfe_rgb_bridge_reorder_parity():
    """RGB-scale checkpoints flatten (C, H, W) in torch but (H, W, C) here;
    the converter must permute the bridge kernel rows (advisor finding).
    Golden: functional torch transcription of a 3-channel VFE."""
    rng = np.random.default_rng(7)
    state = make_state(rng, vfe_ch=3)
    variables = _convert(state)   # vfe_channels auto-inferred from conv shape

    B, C = 2, 3
    cells = rng.uniform(0, 1, (B, C, CELL_H, CELL_W)).astype(np.float32)
    # reference RGB-scale: grayscale render replicated to 3 channels
    tx = torch.tensor(cells.reshape(B * C, 1, CELL_H, CELL_W)).repeat(1, 3, 1, 1)
    for i in range(VFE_L):
        p = f"encoder.VisualFeatureExtractor.embedder.{3 * i}"
        tx = F.conv2d(tx, state[f"{p}.weight"], state[f"{p}.bias"], padding=1)
        q = f"encoder.VisualFeatureExtractor.embedder.{3 * i + 1}"
        tx = F.batch_norm(tx, state[f"{q}.running_mean"],
                          state[f"{q}.running_var"], state[f"{q}.weight"],
                          state[f"{q}.bias"], False)
        tx = F.relu(tx)
    tx = tx.reshape(B * C, -1)   # NCHW flatten: (c, h, w) row order
    tx = F.relu(tx @ state["encoder.VisualFeatureExtractor.bridge.0.weight"].T
                + state["encoder.VisualFeatureExtractor.bridge.0.bias"])
    golden = tx.reshape(B, C, H).detach().numpy()

    from visual_onoma_to_wave_tpu.models.vfe import VisualFeatureExtractor
    vfe = VisualFeatureExtractor(embed_dim=H, kernel_size=(3, 3),
                                 num_convolutions=VFE_L, channels=3)
    ours = vfe.apply(
        {"params": variables["params"]["vfe"],
         "batch_stats": variables["batch_stats"]["vfe"]},
        jnp.asarray(cells), True)
    np.testing.assert_allclose(np.asarray(ours), golden, atol=2e-5)


def test_full_model_forward_parity():
    """Full converted-checkpoint forward parity: functional torch vTTS
    (VFE -> encoder -> +audiotype -> variance adaptor (teacher-forced
    durations, target-bucketized energy/kurtosis) -> LR -> decoder ->
    mel_linear -> PostNet residual) vs our VTTS.apply on the same weights.

    Uses full-length sequences (no padding) so masking is inert; dropout off
    (deterministic) and BatchNorm in eval mode on both sides."""
    rng = np.random.default_rng(9)
    state = make_state(rng)
    variables = _convert(state)
    model = _model()

    B, C = 2, 4
    DUR = 6
    T_mel = C * DUR
    cells = rng.uniform(0, 1, (B, C, CELL_H, CELL_W)).astype(np.float32)
    audiotypes = np.array([1, 3], np.int32)
    e_t = rng.standard_normal((B, C)).astype(np.float32)
    k_t = rng.uniform(2.0, 80.0, (B, C)).astype(np.float32)
    durations = np.full((B, C), DUR, np.int32)

    # ---- torch functional forward ----
    from visual_onoma_to_wave_tpu.models.layers import sinusoid_position_table
    from visual_onoma_to_wave_tpu.models.variance_adaptor import _make_bins

    # VFE (reuse the transcription from test_vfe_forward_parity)
    tx = torch.tensor(cells.reshape(B * C, 1, CELL_H, CELL_W))
    for i in range(VFE_L):
        p = f"encoder.VisualFeatureExtractor.embedder.{3 * i}"
        tx = F.conv2d(tx, state[f"{p}.weight"], state[f"{p}.bias"], padding=1)
        q = f"encoder.VisualFeatureExtractor.embedder.{3 * i + 1}"
        tx = F.batch_norm(tx, state[f"{q}.running_mean"],
                          state[f"{q}.running_var"], state[f"{q}.weight"],
                          state[f"{q}.bias"], False)
        tx = F.relu(tx)
    tx = tx.reshape(B * C, -1)
    tx = F.relu(tx @ state["encoder.VisualFeatureExtractor.bridge.0.weight"].T
                + state["encoder.VisualFeatureExtractor.bridge.0.bias"])
    x = tx.reshape(B, C, H)

    pos = torch.tensor(sinusoid_position_table(65, H))
    x = x + pos[None, :C, :]
    for i in range(ENC_L):
        x = _torch_fft_block(state, f"encoder.layer_stack.{i}", x)
    x = x + torch.tensor(state["audiotype_emb.weight"].numpy())[
        torch.tensor(audiotypes.astype(np.int64))][:, None, :]

    def vp_forward(prefix, h):
        h0 = h
        h = F.conv1d(h0.transpose(1, 2),
                     state[f"{prefix}.conv_layer.conv1d_1.conv.weight"],
                     state[f"{prefix}.conv_layer.conv1d_1.conv.bias"],
                     padding=1).transpose(1, 2)
        h = F.layer_norm(F.relu(h), (H,),
                         state[f"{prefix}.conv_layer.layer_norm_1.weight"],
                         state[f"{prefix}.conv_layer.layer_norm_1.bias"])
        h = F.conv1d(h.transpose(1, 2),
                     state[f"{prefix}.conv_layer.conv1d_2.conv.weight"],
                     state[f"{prefix}.conv_layer.conv1d_2.conv.bias"],
                     padding=1).transpose(1, 2)
        h = F.layer_norm(F.relu(h), (H,),
                         state[f"{prefix}.conv_layer.layer_norm_2.weight"],
                         state[f"{prefix}.conv_layer.layer_norm_2.bias"])
        return (h @ state[f"{prefix}.linear_layer.weight"].T
                + state[f"{prefix}.linear_layer.bias"])[..., 0]

    # energy: embed bucketized TARGET (train branch, modules.py:53-56)
    e_bins = torch.tensor(_make_bins(-2.0, 2.0, 256, "linear"))
    ids = torch.bucketize(torch.tensor(e_t), e_bins)
    x = x + torch.tensor(
        state["variance_adaptor.energy_embedding.weight"].numpy())[ids]
    k_bins = torch.tensor(_make_bins(1.0, 90.0, 256, "linear"))
    ids = torch.bucketize(torch.tensor(k_t), k_bins)
    x = x + torch.tensor(
        state["variance_adaptor.kurt_embedding.weight"].numpy())[ids]

    # length regulator: repeat each char DUR times (reference expand loop)
    x = x.repeat_interleave(DUR, dim=1)          # (B, T_mel, H)
    x = x + pos[None, :T_mel, :]
    for i in range(DEC_L):
        x = _torch_fft_block(state, f"decoder.layer_stack.{i}", x)
    mel = x @ state["mel_linear.weight"].T + state["mel_linear.bias"]

    th = mel.transpose(1, 2)
    for i in range(NPOST):
        th = F.conv1d(th, state[f"postnet.convolutions.{i}.0.conv.weight"],
                      state[f"postnet.convolutions.{i}.0.conv.bias"], padding=2)
        th = F.batch_norm(th, state[f"postnet.convolutions.{i}.1.running_mean"],
                          state[f"postnet.convolutions.{i}.1.running_var"],
                          state[f"postnet.convolutions.{i}.1.weight"],
                          state[f"postnet.convolutions.{i}.1.bias"], False)
        if i < NPOST - 1:
            th = torch.tanh(th)
    golden = (mel + th.transpose(1, 2)).detach().numpy()

    # ---- ours ----
    out = model.apply(
        variables,
        audiotypes=audiotypes,
        texts=np.ones((B, C), np.int32),
        src_lens=np.full((B,), C, np.int32),
        image_cells=cells,
        energy_targets=e_t, kurtosis_targets=k_t,
        duration_targets=durations,
        use_image=True, deterministic=True, max_mel_len=T_mel)
    ours = np.asarray(out["postnet_mel"])

    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=5e-4)
