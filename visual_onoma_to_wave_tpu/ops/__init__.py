from visual_onoma_to_wave_tpu.ops.stft import (
    MelPipeline,
    char_level_energy,
    griffin_lim,
    hann_window,
    logmel_and_energy,
    magnitude_spectrogram,
    melscale_fbanks,
    spectral_kurtosis,
)
from visual_onoma_to_wave_tpu.ops.length_regulator import (
    expand_char_to_frame,
    get_mask_from_lengths,
    length_regulate,
)
from visual_onoma_to_wave_tpu.ops.pallas_mel import (
    pallas_clip_features,
    pallas_logmel_energy,
)

__all__ = [
    "MelPipeline",
    "char_level_energy",
    "expand_char_to_frame",
    "get_mask_from_lengths",
    "griffin_lim",
    "hann_window",
    "length_regulate",
    "logmel_and_energy",
    "magnitude_spectrogram",
    "melscale_fbanks",
    "pallas_clip_features",
    "pallas_logmel_energy",
    "spectral_kurtosis",
]
