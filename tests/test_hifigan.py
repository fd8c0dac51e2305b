"""HiFi-GAN generator parity vs a functional torch transcription.

Builds a random-weight torch state_dict in the reference checkpoint layout,
runs a compact functional torch forward (F.conv1d / F.conv_transpose1d), and
checks our flax generator + converter reproduce the waveform sample-exactly.
"""
import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from visual_onoma_to_wave_tpu.models.hifigan import (
    HiFiGANGenerator,
    convert_torch_state_dict,
    vocoder_infer,
)

UPS = (8, 8, 2, 2)
UPK = (16, 16, 4, 4)
RKS = (3, 7, 11)
RDS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
CH0 = 32  # shrunk from 512 for test speed
N_MELS = 8


def make_state(rng) -> dict:
    s = {}

    def conv(name, cout, cin, k):
        s[f"{name}.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1)
        s[f"{name}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32) * 0.1)

    def convtr(name, cin, cout, k):
        s[f"{name}.weight"] = torch.tensor(
            rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.1)
        s[f"{name}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32) * 0.1)

    conv("conv_pre", CH0, N_MELS, 7)
    for i, (u, k) in enumerate(zip(UPS, UPK)):
        cin, cout = CH0 // 2 ** i, CH0 // 2 ** (i + 1)
        convtr(f"ups.{i}", cin, cout, k)
        for j, rk in enumerate(RKS):
            r = i * len(RKS) + j
            for di in range(3):
                conv(f"resblocks.{r}.convs1.{di}", cout, cout, rk)
                conv(f"resblocks.{r}.convs2.{di}", cout, cout, rk)
    conv("conv_post", 1, CH0 // 2 ** len(UPS), 7)
    return s


def torch_forward(s: dict, mel: torch.Tensor) -> torch.Tensor:
    """Functional transcription of the reference Generator.forward
    (hifigan/models.py:149-165)."""
    x = F.conv1d(mel, s["conv_pre.weight"], s["conv_pre.bias"], padding=3)
    for i, (u, k) in enumerate(zip(UPS, UPK)):
        x = F.leaky_relu(x, 0.1)
        x = F.conv_transpose1d(
            x, s[f"ups.{i}.weight"], s[f"ups.{i}.bias"], stride=u,
            padding=(k - u) // 2)
        acc = None
        for j, rk in enumerate(RKS):
            r = i * len(RKS) + j
            y = x
            for di, d in enumerate(RDS[j]):
                h = F.leaky_relu(y, 0.1)
                h = F.conv1d(h, s[f"resblocks.{r}.convs1.{di}.weight"],
                             s[f"resblocks.{r}.convs1.{di}.bias"],
                             dilation=d, padding=d * (rk - 1) // 2)
                h = F.leaky_relu(h, 0.1)
                h = F.conv1d(h, s[f"resblocks.{r}.convs2.{di}.weight"],
                             s[f"resblocks.{r}.convs2.{di}.bias"],
                             padding=(rk - 1) // 2)
                y = y + h
            acc = y if acc is None else acc + y
        x = acc / len(RKS)
    x = F.leaky_relu(x)  # default slope 0.01
    x = F.conv1d(x, s["conv_post.weight"], s["conv_post.bias"], padding=3)
    return torch.tanh(x)


def test_generator_matches_torch_sample_exact():
    rng = np.random.default_rng(0)
    state = make_state(rng)
    mel = rng.standard_normal((2, N_MELS, 17)).astype(np.float32)

    golden = torch_forward(state, torch.tensor(mel)).detach().numpy()[:, 0, :]

    gen = HiFiGANGenerator(
        upsample_rates=UPS, upsample_kernel_sizes=UPK,
        upsample_initial_channel=CH0, resblock_kernel_sizes=RKS,
        resblock_dilations=RDS, n_mels=N_MELS)
    params = {"params": convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()},
        upsample_rates=UPS, resblock_kernel_sizes=RKS, resblock_dilations=RDS)}
    ours = np.asarray(gen.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))

    assert ours.shape == golden.shape == (2, 17 * 256)
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_weight_norm_folding():
    """A weight-normed conv must fold to the same result as a plain one."""
    rng = np.random.default_rng(1)
    w = torch.tensor(rng.standard_normal((4, 3, 5)).astype(np.float32))
    g = torch.tensor(rng.uniform(0.5, 2.0, (4, 1, 1)).astype(np.float32))
    state_v = {"c.weight_g": g, "c.weight_v": w,
               "c.bias": torch.zeros(4)}
    from visual_onoma_to_wave_tpu.models.hifigan import _fold_weight_norm
    folded = _fold_weight_norm({k: v.numpy() for k, v in state_v.items()}, "c")
    norm = torch.sqrt((w ** 2).sum(dim=(1, 2), keepdim=True))
    expected = (g * w / norm).numpy()
    np.testing.assert_allclose(folded, expected, rtol=1e-6)


def test_vocoder_infer_lengths():
    rng = np.random.default_rng(2)
    state = make_state(rng)
    gen_params = {"params": convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()},
        upsample_rates=UPS, resblock_kernel_sizes=RKS, resblock_dilations=RDS)}
    mel = jnp.asarray(rng.standard_normal((2, 10, N_MELS)).astype(np.float32))
    # vocoder_infer jits the default-config generator; apply directly here
    gen = HiFiGANGenerator(
        upsample_rates=UPS, upsample_kernel_sizes=UPK,
        upsample_initial_channel=CH0, resblock_kernel_sizes=RKS,
        resblock_dilations=RDS, n_mels=N_MELS)
    wav = np.asarray(gen.apply(gen_params, mel))
    assert wav.shape == (2, 2560)
    assert np.abs(wav).max() <= 1.0


def test_bf16_compute_path_close_to_f32():
    """dtype=bfloat16 runs the conv stack in bf16 (f32 accumulation); the
    waveform must stay close to the f32 path."""
    rng = np.random.default_rng(3)
    state = make_state(rng)
    params = {"params": convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()},
        upsample_rates=UPS, resblock_kernel_sizes=RKS, resblock_dilations=RDS)}
    mel = jnp.asarray(rng.standard_normal((2, 13, N_MELS)).astype(np.float32))
    kw = dict(upsample_rates=UPS, upsample_kernel_sizes=UPK,
              upsample_initial_channel=CH0, resblock_kernel_sizes=RKS,
              resblock_dilations=RDS, n_mels=N_MELS)
    ref = np.asarray(HiFiGANGenerator(**kw).apply(params, mel))
    low = np.asarray(
        HiFiGANGenerator(**kw, dtype=jnp.bfloat16).apply(params, mel))
    assert low.dtype == np.float32  # final conv + tanh stay f32
    # bf16 has ~3 significant digits; tanh keeps everything in [-1, 1]
    assert np.abs(low - ref).max() < 0.05
    denom = np.linalg.norm(ref) + 1e-9
    assert np.linalg.norm(low - ref) / denom < 0.05


def test_chunked_vocoding_sample_exact():
    """Chunked (streaming) vocoding with the computed receptive-field halo
    must match the full forward sample-exactly away from sequence edges —
    and everywhere, since edge padding matches torch zero-pad semantics."""
    from visual_onoma_to_wave_tpu.models.hifigan import (
        receptive_halo_frames, vocoder_infer_chunked)

    rng = np.random.default_rng(5)
    state = make_state(rng)
    params = {"params": convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()},
        upsample_rates=UPS, resblock_kernel_sizes=RKS,
        resblock_dilations=RDS)}
    gen = HiFiGANGenerator(
        upsample_rates=UPS, upsample_kernel_sizes=UPK,
        upsample_initial_channel=CH0, resblock_kernel_sizes=RKS,
        resblock_dilations=RDS, n_mels=N_MELS)
    mel = jnp.asarray(rng.standard_normal((2, 43, N_MELS)).astype(np.float32))

    full = np.asarray(gen.apply(params, mel))
    halo = receptive_halo_frames(UPS, UPK, RKS, RDS)
    chunked = np.asarray(vocoder_infer_chunked(
        params, mel, chunk_frames=16, gen=gen))
    assert chunked.shape == full.shape
    h = halo * 256  # true edges differ (zero pad vs reflect of nothing)
    np.testing.assert_allclose(chunked[:, h:-h], full[:, h:-h], atol=1e-5)
    # an insufficient halo must NOT be sample-exact (sanity of the bound)
    bad = np.asarray(vocoder_infer_chunked(
        params, mel, chunk_frames=16, halo_frames=1, gen=gen))
    assert np.abs(bad[:, h:-h] - full[:, h:-h]).max() > 1e-4


# ---------------------------------------------------------------------------
# V3 preset: ResBlock2 generator parity (official config_v3.json layout)
# ---------------------------------------------------------------------------

V3_UPS = (8, 8, 4)
V3_UPK = (16, 16, 8)
V3_RKS = (3, 5, 7)
V3_RDS = ((1, 2), (2, 6), (3, 12))
V3_CH0 = 32  # shrunk from 256 for test speed


def make_state_v3(rng) -> dict:
    s = {}

    def conv(name, cout, cin, k):
        s[f"{name}.weight"] = torch.tensor(
            rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1)
        s[f"{name}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32) * 0.1)

    def convtr(name, cin, cout, k):
        s[f"{name}.weight"] = torch.tensor(
            rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.1)
        s[f"{name}.bias"] = torch.tensor(
            rng.standard_normal(cout).astype(np.float32) * 0.1)

    conv("conv_pre", V3_CH0, N_MELS, 7)
    for i, (u, k) in enumerate(zip(V3_UPS, V3_UPK)):
        cin, cout = V3_CH0 // 2 ** i, V3_CH0 // 2 ** (i + 1)
        convtr(f"ups.{i}", cin, cout, k)
        for j, rk in enumerate(V3_RKS):
            r = i * len(V3_RKS) + j
            for di in range(len(V3_RDS[j])):
                conv(f"resblocks.{r}.convs.{di}", cout, cout, rk)
    conv("conv_post", 1, V3_CH0 // 2 ** len(V3_UPS), 7)
    return s


def torch_forward_v3(s: dict, mel: torch.Tensor) -> torch.Tensor:
    """Functional transcription of the official Generator with resblock
    type "2" (hifi-gan models.py ResBlock2: one dilated conv per
    residual)."""
    x = F.conv1d(mel, s["conv_pre.weight"], s["conv_pre.bias"], padding=3)
    for i, (u, k) in enumerate(zip(V3_UPS, V3_UPK)):
        x = F.leaky_relu(x, 0.1)
        x = F.conv_transpose1d(
            x, s[f"ups.{i}.weight"], s[f"ups.{i}.bias"], stride=u,
            padding=(k - u) // 2)
        acc = None
        for j, rk in enumerate(V3_RKS):
            r = i * len(V3_RKS) + j
            y = x
            for di, d in enumerate(V3_RDS[j]):
                h = F.leaky_relu(y, 0.1)
                h = F.conv1d(h, s[f"resblocks.{r}.convs.{di}.weight"],
                             s[f"resblocks.{r}.convs.{di}.bias"],
                             dilation=d, padding=d * (rk - 1) // 2)
                y = y + h
            acc = y if acc is None else acc + y
        x = acc / len(V3_RKS)
    x = F.leaky_relu(x)
    x = F.conv1d(x, s["conv_post.weight"], s["conv_post.bias"], padding=3)
    return torch.tanh(x)


def test_v3_generator_matches_torch_sample_exact():
    rng = np.random.default_rng(7)
    state = make_state_v3(rng)
    mel = rng.standard_normal((2, N_MELS, 13)).astype(np.float32)

    golden = torch_forward_v3(state, torch.tensor(mel)
                              ).detach().numpy()[:, 0, :]

    gen = HiFiGANGenerator(
        upsample_rates=V3_UPS, upsample_kernel_sizes=V3_UPK,
        upsample_initial_channel=V3_CH0, resblock_kernel_sizes=V3_RKS,
        resblock_dilations=V3_RDS, resblock_type="2", n_mels=N_MELS)
    assert gen.total_upsample == 256
    params = {"params": convert_torch_state_dict(
        {k: v.numpy() for k, v in state.items()},
        upsample_rates=V3_UPS, resblock_kernel_sizes=V3_RKS,
        resblock_dilations=V3_RDS, resblock_type="2")}
    ours = np.asarray(gen.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))

    assert ours.shape == golden.shape == (2, 13 * 256)
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_hifigan_presets_dispatch():
    """get_vocoder's v1/v2/v3 presets build the official architectures and
    all keep hop-length upsampling; V3's chunked halo is exact."""
    from visual_onoma_to_wave_tpu.models.hifigan import (
        receptive_halo_frames, vocoder_infer_chunked)
    from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder

    import jax

    v1 = get_vocoder("HiFi-GAN-v1")
    v2 = get_vocoder("HiFi-GAN-v2")
    v3 = get_vocoder("HiFi-GAN-v3")
    assert v1.upsample_initial_channel == 512 and v1.resblock_type == "1"
    assert v2.upsample_initial_channel == 128 and v2.resblock_type == "1"
    assert (v3.upsample_initial_channel, v3.resblock_type) == (256, "2")
    assert v3.upsample_rates == (8, 8, 4)
    for g in (v1, v2, v3):
        assert g.total_upsample == 256
    # explicit kwargs still override a preset
    small = get_vocoder("HiFi-GAN-v3", upsample_initial_channel=32)
    assert small.upsample_initial_channel == 32 and small.resblock_type == "2"

    # chunked vocoding with the type-2 halo is sample-exact (tiny v3)
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal((1, 40, 80)).astype(np.float32))
    params = jax.jit(small.init)(jax.random.PRNGKey(0), mel)
    full = np.asarray(small.apply(params, mel))
    halo = receptive_halo_frames(
        small.upsample_rates, small.upsample_kernel_sizes,
        small.resblock_kernel_sizes, small.resblock_dilations,
        resblock_type="2")
    chunked = np.asarray(vocoder_infer_chunked(
        params, mel, chunk_frames=16, gen=small))
    edge = halo * 256
    np.testing.assert_allclose(chunked[0, edge:-edge], full[0, edge:-edge],
                               atol=1e-5)
