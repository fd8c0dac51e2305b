"""MelGAN generator parity vs a functional torch transcription.

Mirrors tests/test_hifigan.py: random weight-normed state_dict in the
torch-hub sequential layout, functional torch forward, sample-exact check
of the flax module + converter.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax

import jax.numpy as jnp

from visual_onoma_to_wave_tpu.models.melgan import (
    MelGANGenerator,
    convert_melgan_state_dict,
    melgan_infer,
)

RATIOS = (8, 8, 2, 2)
NRES = 3
NGF = 4          # shrunk from 32 for test speed
N_MELS = 8


def make_state(rng) -> dict:
    s = {}

    def wn_conv(prefix, cout, cin, k):
        v = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1
        g = rng.uniform(0.5, 1.5, (cout, 1, 1)).astype(np.float32)
        s[f"{prefix}.weight_v"] = torch.tensor(v)
        s[f"{prefix}.weight_g"] = torch.tensor(g)
        s[f"{prefix}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32) * 0.1)

    def wn_convtr(prefix, cin, cout, k):
        v = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.1
        g = rng.uniform(0.5, 1.5, (cin, 1, 1)).astype(np.float32)
        s[f"{prefix}.weight_v"] = torch.tensor(v)
        s[f"{prefix}.weight_g"] = torch.tensor(g)
        s[f"{prefix}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32) * 0.1)

    mult = 2 ** len(RATIOS)
    ch = mult * NGF
    wn_conv("model.1", ch, N_MELS, 7)
    idx = 2
    for r in RATIOS:
        idx += 1
        wn_convtr(f"model.{idx}", ch, ch // 2, 2 * r)
        ch //= 2
        idx += 1
        for _ in range(NRES):
            wn_conv(f"model.{idx}.block.2", ch, ch, 3)
            wn_conv(f"model.{idx}.block.4", ch, ch, 1)
            wn_conv(f"model.{idx}.shortcut", ch, ch, 1)
            idx += 1
    idx += 2
    wn_conv(f"model.{idx}", 1, NGF, 7)
    return s


def _w(s, prefix):
    v, g = s[f"{prefix}.weight_v"], s[f"{prefix}.weight_g"]
    norm = torch.sqrt((v ** 2).sum(dim=tuple(range(1, v.ndim)), keepdim=True))
    return g * v / norm


def torch_forward(s: dict, mel: torch.Tensor) -> torch.Tensor:
    """Functional transcription of the melgan-neurips Generator."""
    x = F.conv1d(F.pad(mel, (3, 3), mode="reflect"),
                 _w(s, "model.1"), s["model.1.bias"])
    idx = 2
    for r in RATIOS:
        idx += 1
        x = F.leaky_relu(x, 0.2)
        x = F.conv_transpose1d(x, _w(s, f"model.{idx}"),
                               s[f"model.{idx}.bias"], stride=r,
                               padding=r // 2, output_padding=r % 2)
        idx += 1
        for j in range(NRES):
            d = 3 ** j
            p = f"model.{idx}"
            h = F.leaky_relu(x, 0.2)
            h = F.conv1d(F.pad(h, (d, d), mode="reflect"),
                         _w(s, f"{p}.block.2"), s[f"{p}.block.2.bias"],
                         dilation=d)
            h = F.leaky_relu(h, 0.2)
            h = F.conv1d(h, _w(s, f"{p}.block.4"), s[f"{p}.block.4.bias"])
            sc = F.conv1d(x, _w(s, f"{p}.shortcut"), s[f"{p}.shortcut.bias"])
            x = sc + h
            idx += 1
    idx += 2
    x = F.leaky_relu(x, 0.2)
    x = F.conv1d(F.pad(x, (3, 3), mode="reflect"),
                 _w(s, f"model.{idx}"), s[f"model.{idx}.bias"])
    return torch.tanh(x)


def test_melgan_matches_torch_sample_exact():
    rng = np.random.default_rng(0)
    state = make_state(rng)
    mel = rng.standard_normal((2, N_MELS, 11)).astype(np.float32)

    golden = torch_forward(state, torch.tensor(mel)).detach().numpy()[:, 0, :]

    gen = MelGANGenerator(n_mels=N_MELS, ngf=NGF,
                          n_residual_layers=NRES, ratios=RATIOS)
    params = {"params": convert_melgan_state_dict(
        {k: v.numpy() for k, v in state.items()},
        ratios=RATIOS, n_residual_layers=NRES)}
    ours = np.asarray(gen.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))

    assert ours.shape == golden.shape == (2, 11 * 256)
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_melgan_infer_log10_and_lengths():
    rng = np.random.default_rng(1)
    state = make_state(rng)
    gen = MelGANGenerator(n_mels=N_MELS, ngf=NGF,
                          n_residual_layers=NRES, ratios=RATIOS)
    params = {"params": convert_melgan_state_dict(
        {k: v.numpy() for k, v in state.items()},
        ratios=RATIOS, n_residual_layers=NRES)}
    mels = jnp.asarray(rng.standard_normal((2, 9, N_MELS)).astype(np.float32))
    wavs, lens = melgan_infer(params, mels, lengths=[5, 9], gen=gen)
    assert wavs.shape == (2, 9 * 256)
    assert list(lens) == [5 * 256, 9 * 256]
    # log10 scaling applied: feeding ln-mels equals applying on mels/ln(10)
    direct = gen.apply(params, mels / np.log(10.0))
    np.testing.assert_allclose(np.asarray(wavs), np.asarray(direct), atol=1e-6)


def test_melgan_infer_reuses_compiled_executable():
    """melgan_infer must hit one cached jit across calls (advisor finding:
    jax.jit(gen.apply) per call re-traced every time)."""
    from visual_onoma_to_wave_tpu.models import melgan as melgan_mod

    rng = np.random.default_rng(2)
    state = make_state(rng)
    gen = MelGANGenerator(n_mels=N_MELS, ngf=NGF,
                          n_residual_layers=NRES, ratios=RATIOS)
    params = {"params": convert_melgan_state_dict(
        {k: v.numpy() for k, v in state.items()},
        ratios=RATIOS, n_residual_layers=NRES)}
    mels = jnp.asarray(rng.standard_normal((1, 7, N_MELS)).astype(np.float32))
    melgan_mod._infer._clear_cache()
    melgan_infer(params, mels, gen=gen)
    misses = melgan_mod._infer._cache_size()
    # same config (fresh but equal module) + same shape -> no new trace
    gen2 = MelGANGenerator(n_mels=N_MELS, ngf=NGF,
                           n_residual_layers=NRES, ratios=RATIOS)
    melgan_infer(params, mels, gen=gen2)
    melgan_infer(params, mels, gen=gen)
    assert melgan_mod._infer._cache_size() == misses == 1


def test_melgan_rejects_odd_ratios():
    gen = MelGANGenerator(n_mels=N_MELS, ngf=NGF, n_residual_layers=NRES,
                          ratios=(8, 3, 2))
    with pytest.raises(AssertionError, match="even upsample ratios"):
        gen.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 4, N_MELS), jnp.float32))
    with pytest.raises(AssertionError, match="even upsample ratios"):
        convert_melgan_state_dict({}, ratios=(8, 3, 2))
