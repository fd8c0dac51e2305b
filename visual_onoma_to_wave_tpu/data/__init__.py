from visual_onoma_to_wave_tpu.data.alignment import Alignment, align_tier
from visual_onoma_to_wave_tpu.data.audio_io import (
    load_audio,
    raw_to_wav,
    read_raw_pcm16,
    read_wav,
    resample,
    write_wav,
)
from visual_onoma_to_wave_tpu.data.dataset import (
    OnomaDataset,
    Sample,
    pad_character_cells,
)
from visual_onoma_to_wave_tpu.data.formatting import format_dataset, format_rwcpssd
from visual_onoma_to_wave_tpu.data.labels import (
    Interval,
    prepare_textgrids,
    read_lab,
    read_textgrid,
    write_textgrid,
)
from visual_onoma_to_wave_tpu.data.preprocess import Preprocessor
from visual_onoma_to_wave_tpu.data.renderer import (
    VisualTextRenderer,
    allocate_character_widths,
    compute_visualtext_info,
)
from visual_onoma_to_wave_tpu.data.symbols import build_symbol_map, encode_text

__all__ = [
    "Alignment",
    "Interval",
    "OnomaDataset",
    "Preprocessor",
    "Sample",
    "VisualTextRenderer",
    "align_tier",
    "allocate_character_widths",
    "build_symbol_map",
    "compute_visualtext_info",
    "encode_text",
    "format_dataset",
    "format_rwcpssd",
    "load_audio",
    "pad_character_cells",
    "prepare_textgrids",
    "raw_to_wav",
    "read_lab",
    "read_raw_pcm16",
    "read_textgrid",
    "read_wav",
    "resample",
    "write_textgrid",
    "write_wav",
]
