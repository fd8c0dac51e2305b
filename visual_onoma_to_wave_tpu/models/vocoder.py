"""Vocoder family dispatch (reference scripts/utils/model.py:41-98).

The reference selects between HiFi-GAN (local checkpoint) and MelGAN
(torch.hub) from config["vocoder"]["model"]; here both families are native
flax modules with torch-checkpoint converters, and `vocoder_infer` routes
ln-domain mels to whichever family is configured (MelGAN expects log10,
handled inside melgan_infer).
"""
from __future__ import annotations

import jax.numpy as jnp

from visual_onoma_to_wave_tpu.models.hifigan import (
    HiFiGANGenerator,
    load_torch_generator,
)
from visual_onoma_to_wave_tpu.models.hifigan import vocoder_infer as _hifigan_infer
from visual_onoma_to_wave_tpu.models.melgan import (
    MelGANGenerator,
    load_torch_melgan,
    melgan_infer,
)


def get_vocoder(model: str = "HiFi-GAN", *, dtype=jnp.float32, **kwargs):
    """Build the configured vocoder module (params loaded separately via
    utils.checkpoint.load_params or the torch converters).

    Families: HiFi-GAN (reference parity), MelGAN (reference's torch.hub
    alternative), iSTFTNet / iSTFTNet-mel (beyond-reference iSTFT-head
    generators, models/istftnet.py), Vocos (ConvNeXt trunk at mel rate,
    models/vocos.py) and BigVGAN / BigVGAN-large (snake + anti-aliased,
    models/bigvgan.py) — the non-reference families self-trained via
    `cli train-vocoder`.
    """
    name = model.lower().replace("-", "").replace("_", "")
    if name == "melgan":
        return MelGANGenerator(**kwargs)
    if name in ("hifigan", "hifiganv1", "hifiganv2", "hifiganv3"):
        from visual_onoma_to_wave_tpu.models.hifigan import HIFIGAN_PRESETS
        preset = dict(HIFIGAN_PRESETS[name[-2:] if name != "hifigan"
                                      else "v1"])
        preset.update(kwargs)  # explicit overrides win
        return HiFiGANGenerator(dtype=dtype, **preset)
    if name in ("istftnet", "istftnetmel"):
        from visual_onoma_to_wave_tpu.models.istftnet import build_istftnet
        preset = "melrate" if name == "istftnetmel" else "c8c8i"
        return build_istftnet(preset, dtype=dtype, **kwargs)
    if name == "vocos":
        from visual_onoma_to_wave_tpu.models.vocos import VocosGenerator
        return VocosGenerator(dtype=dtype, **kwargs)
    if name in ("bigvgan", "bigvganbase", "bigvganlarge"):
        from visual_onoma_to_wave_tpu.models.bigvgan import (
            BIGVGAN_PRESETS, BigVGANGenerator)
        preset = dict(BIGVGAN_PRESETS["large" if name.endswith("large")
                                      else "base"])
        preset.update(kwargs)
        return BigVGANGenerator(dtype=dtype, **preset)
    raise ValueError(f"unknown vocoder family: {model!r}")


def load_torch_vocoder(model: str, ckpt_path: str) -> dict:
    name = model.lower().replace("-", "")
    if name == "melgan":
        return load_torch_melgan(ckpt_path)
    if name == "hifigan":
        return load_torch_generator(ckpt_path)
    raise ValueError(f"unknown vocoder family: {model!r}")


def vocoder_infer(params, mels, lengths=None, hop_length: int = 256,
                  gen=None, model: str = "HiFi-GAN"):
    """Batched ln-mel (B, T, M) -> waveform for whichever family `gen` (or
    `model`) names. Returns (wavs (B, T*hop), per-item sample lengths)."""
    if isinstance(gen, MelGANGenerator) or (
            gen is None and model.lower().replace("-", "") == "melgan"):
        return melgan_infer(params, mels, lengths, hop_length, gen)
    return _hifigan_infer(params, mels, lengths, hop_length, gen)
