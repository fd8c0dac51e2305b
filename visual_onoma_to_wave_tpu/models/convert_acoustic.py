"""Torch -> flax converter for the published vTTS acoustic checkpoint.

Maps the reference's state_dict layout (reference scripts/model/vtts.py
module tree: encoder / variance_adaptor / decoder / mel_linear / postnet /
audiotype_emb, with scripts/transformer/* and scripts/model/modules.py
submodule names) onto this framework's VTTS parameter pytree, so users can
load the released `200000.pth.tar` (downloaded by the reference's setup.sh)
directly.

Layout rules:
  torch nn.Linear  (out, in)        -> Dense kernel (in, out)
  torch nn.Conv1d  (out, in, k)     -> nn.Conv kernel (k, in, out)
  torch nn.Conv2d  (out, in, kh, kw)-> nn.Conv kernel (kh, kw, in, out)
  torch nn.Embedding                -> Embed embedding (unchanged)
  torch LayerNorm weight/bias       -> scale/bias
  torch BatchNorm1d/2d              -> scale/bias + batch_stats mean/var

Buffers that are re-derived at trace time (position_enc sinusoid tables,
energy/kurtosis bins from stats.json) are intentionally skipped.

Caveat preserved from the reference: VariancePredictor's second conv uses
hard-coded padding=1 (modules.py:~244) — identical to SAME only for the
shipped kernel_size=3; the converter asserts that configuration.
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _lin(s, p):
    return (np.asarray(s[f"{p}.weight"], np.float32).T,
            np.asarray(s[f"{p}.bias"], np.float32))


def _conv1d(s, p):
    w = np.asarray(s[f"{p}.weight"], np.float32).transpose(2, 1, 0)
    return w, np.asarray(s[f"{p}.bias"], np.float32)


def _conv2d(s, p):
    w = np.asarray(s[f"{p}.weight"], np.float32).transpose(2, 3, 1, 0)
    return w, np.asarray(s[f"{p}.bias"], np.float32)


def _ln(s, p):
    return {"scale": np.asarray(s[f"{p}.weight"], np.float32),
            "bias": np.asarray(s[f"{p}.bias"], np.float32)}


def _bn(s, p):
    params = {"scale": np.asarray(s[f"{p}.weight"], np.float32),
              "bias": np.asarray(s[f"{p}.bias"], np.float32)}
    stats = {"mean": np.asarray(s[f"{p}.running_mean"], np.float32),
             "var": np.asarray(s[f"{p}.running_var"], np.float32)}
    return params, stats


def _dense(s, p):
    k, b = _lin(s, p)
    return {"kernel": k, "bias": b}


def _convp(s, p):
    k, b = _conv1d(s, p)
    return {"kernel": k, "bias": b}


def _fft_stack(s, prefix: str, n_layers: int) -> dict:
    out = {}
    for i in range(n_layers):
        lp = f"{prefix}.layer_stack.{i}"
        out[f"layer_{i}"] = {
            "slf_attn": {
                "w_qs": _dense(s, f"{lp}.slf_attn.w_qs"),
                "w_ks": _dense(s, f"{lp}.slf_attn.w_ks"),
                "w_vs": _dense(s, f"{lp}.slf_attn.w_vs"),
                "fc": _dense(s, f"{lp}.slf_attn.fc"),
                "layer_norm": _ln(s, f"{lp}.slf_attn.layer_norm"),
            },
            "pos_ffn": {
                "w_1": _convp(s, f"{lp}.pos_ffn.w_1"),
                "w_2": _convp(s, f"{lp}.pos_ffn.w_2"),
                "layer_norm": _ln(s, f"{lp}.pos_ffn.layer_norm"),
            },
        }
    return out


def _variance_predictor(s, prefix: str) -> dict:
    return {
        "conv1d_1": _convp(s, f"{prefix}.conv_layer.conv1d_1.conv"),
        "layer_norm_1": _ln(s, f"{prefix}.conv_layer.layer_norm_1"),
        "conv1d_2": _convp(s, f"{prefix}.conv_layer.conv1d_2.conv"),
        "layer_norm_2": _ln(s, f"{prefix}.conv_layer.layer_norm_2"),
        "linear_layer": _dense(s, f"{prefix}.linear_layer"),
    }


def convert_vtts_state_dict(
    state: dict,
    encoder_layers: int = 4,
    decoder_layers: int = 6,
    vfe_layers: int = 3,
    postnet_convs: int = 5,
    vp_kernel: int = 3,
    vfe_channels: int | None = None,
) -> dict[str, Any]:
    """Return {"params": ..., "batch_stats": ...} for our VTTS module.

    ``vfe_channels`` is the VFE conv channel count of the checkpoint
    (1 = gray-scale, 3 = RGB-scale, reference model.yaml scale_in_training);
    None (default) infers it from the first embedder conv's input channels.
    The reference flattens the embedder output in NCHW (c, h, w) order before
    its bridge Linear (visual_feature_extractor.py:49-55) while our VFE
    flattens NHWC (h, w, c); for multi-channel checkpoints the bridge kernel
    rows are reordered accordingly.
    """
    assert vp_kernel == 3, (
        "reference VariancePredictor conv1d_2 hard-codes padding=1 "
        "(modules.py), equivalent to SAME only for kernel_size=3")
    s = {k: np.asarray(v) for k, v in state.items()}
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    # ------------------------------ encoder -------------------------------
    if "encoder.src_word_emb.weight" in s:
        params["src_word_emb"] = {
            "embedding": np.asarray(s["encoder.src_word_emb.weight"],
                                    np.float32)}
    vfe_p: dict[str, Any] = {}
    vfe_s: dict[str, Any] = {}
    if f"encoder.VisualFeatureExtractor.embedder.0.weight" in s:
        if vfe_channels is None:
            # torch Conv2d weight is (out, in, kh, kw)
            vfe_channels = int(
                s["encoder.VisualFeatureExtractor.embedder.0.weight"].shape[1])
        # Sequential [Conv2d, BatchNorm2d, ReLU] x layers -> indices 3i/3i+1
        for i in range(vfe_layers):
            base = f"encoder.VisualFeatureExtractor.embedder.{3 * i}"
            k, b = _conv2d(s, base)
            vfe_p[f"conv_{i}"] = {"kernel": k, "bias": b}
            bn_p, bn_s = _bn(s, f"encoder.VisualFeatureExtractor.embedder.{3 * i + 1}")
            vfe_p[f"bn_{i}"] = bn_p
            vfe_s[f"bn_{i}"] = bn_s
        bridge = "encoder.VisualFeatureExtractor.bridge"
        bridge = bridge + ".0" if f"{bridge}.0.weight" in s else bridge
        bridge_p = _dense(s, bridge)
        if vfe_channels > 1:
            # torch flattened (C, H, W); our VFE flattens (H, W, C): permute
            # kernel rows (C, HW, out) -> (HW, C, out).
            k = bridge_p["kernel"]               # (C*H*W, out)
            chw, out_dim = k.shape
            assert chw % vfe_channels == 0, (chw, vfe_channels)
            hw = chw // vfe_channels
            bridge_p["kernel"] = (
                k.reshape(vfe_channels, hw, out_dim)
                .transpose(1, 0, 2).reshape(chw, out_dim))
        vfe_p["bridge"] = bridge_p
        params["vfe"] = vfe_p
        stats["vfe"] = vfe_s
    params["encoder"] = _fft_stack(s, "encoder", encoder_layers)

    # --------------------------- conditioning -----------------------------
    if "audiotype_emb.weight" in s:
        params["audiotype_emb"] = {
            "embedding": np.asarray(s["audiotype_emb.weight"], np.float32)}

    # -------------------------- variance adaptor --------------------------
    va: dict[str, Any] = {
        "duration_predictor": _variance_predictor(
            s, "variance_adaptor.duration_predictor"),
    }
    if "variance_adaptor.energy_predictor.linear_layer.weight" in s:
        va["energy_predictor"] = _variance_predictor(
            s, "variance_adaptor.energy_predictor")
        va["energy_embedding"] = {
            "embedding": np.asarray(
                s["variance_adaptor.energy_embedding.weight"], np.float32)}
    if "variance_adaptor.kurtosis_predictor.linear_layer.weight" in s:
        va["kurtosis_predictor"] = _variance_predictor(
            s, "variance_adaptor.kurtosis_predictor")
        va["kurt_embedding"] = {
            "embedding": np.asarray(
                s["variance_adaptor.kurt_embedding.weight"], np.float32)}
    params["variance_adaptor"] = va

    # ------------------------------ decoder -------------------------------
    params["decoder"] = _fft_stack(s, "decoder", decoder_layers)
    params["mel_linear"] = _dense(s, "mel_linear")

    # ------------------------------ postnet -------------------------------
    pn_p: dict[str, Any] = {}
    pn_s: dict[str, Any] = {}
    for i in range(postnet_convs):
        k, b = _conv1d(s, f"postnet.convolutions.{i}.0.conv")
        pn_p[f"conv_{i}"] = {"kernel": k, "bias": b}
        bn_p, bn_s = _bn(s, f"postnet.convolutions.{i}.1")
        pn_p[f"bn_{i}"] = bn_p
        pn_s[f"bn_{i}"] = bn_s
    params["postnet"] = pn_p
    stats["postnet"] = pn_s

    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)  # noqa: E731
    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}


def load_torch_acoustic(ckpt_path: str) -> dict[str, Any]:
    """Load the published acoustic checkpoint (ckpt['model'], possibly
    DataParallel-prefixed) into our VTTS variables."""
    import torch

    obj = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    state = obj["model"] if isinstance(obj, dict) and "model" in obj else obj
    state = {k.removeprefix("module."): v.numpy()
             for k, v in state.items()}
    return convert_vtts_state_dict(state)
