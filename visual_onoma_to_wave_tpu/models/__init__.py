from visual_onoma_to_wave_tpu.models.layers import (
    FFTBlock,
    MultiHeadAttention,
    PositionwiseFeedForward,
    PostNet,
    VariancePredictor,
    sinusoid_position_table,
)
from visual_onoma_to_wave_tpu.models.variance_adaptor import VarianceAdaptor
from visual_onoma_to_wave_tpu.models.vfe import (
    VisualFeatureExtractor,
    slice_image_to_cells,
)
from visual_onoma_to_wave_tpu.models.vtts import VTTS, FFTStack
from visual_onoma_to_wave_tpu.models.vocoder import (
    get_vocoder,
    load_torch_vocoder,
    vocoder_infer,
)

__all__ = [
    "FFTBlock",
    "FFTStack",
    "MultiHeadAttention",
    "PositionwiseFeedForward",
    "PostNet",
    "VTTS",
    "VarianceAdaptor",
    "VariancePredictor",
    "VisualFeatureExtractor",
    "get_vocoder",
    "load_torch_vocoder",
    "sinusoid_position_table",
    "slice_image_to_cells",
    "vocoder_infer",
]
