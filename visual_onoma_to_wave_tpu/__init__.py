"""TPU-native framework for visual onomatopoeia-to-wave synthesis.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
sarulab-speech/visual-onoma-to-wave (ICASSP 2023): synthesizing environmental
sounds from images of onomatopoeic words, with a FastSpeech2-style acoustic
model conditioned on visual text features and a HiFi-GAN vocoder.
"""

from visual_onoma_to_wave_tpu.config import (
    Config,
    DatasetMetadata,
    FeatureStats,
    load_yaml_configs,
)

__version__ = "0.3.0"

__all__ = [
    "Config",
    "DatasetMetadata",
    "FeatureStats",
    "load_yaml_configs",
]
