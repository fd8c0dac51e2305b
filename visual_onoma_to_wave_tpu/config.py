"""Unified typed configuration for the TPU-native visual-onoma-to-wave framework.

The reference splits configuration across three YAML files (preprocess/model/train,
see /root/reference/config/ICASSP/*.yaml, loaded at scripts/04_train.py:196-202) and
has a legacy/live schema fork (reference scripts/utils/model.py:86 vs
config/ICASSP/preprocess.yaml). We define ONE dataclass schema with the ICASSP
values as defaults; the three-YAML layout can still be loaded via `load_yaml_configs`.
"""
from __future__ import annotations

import dataclasses
import json
import pathlib
from dataclasses import dataclass, field
from typing import Any, Sequence

import yaml


@dataclass(frozen=True)
class PathsConfig:
    corpus: str = "./corpus/RWCP-SSD"
    formatted: str = "./formatted_data/RWCP-SSD"
    preprocessed: str = "./preprocessed_data/RWCP-SSD/latest"
    font: str = "./font/ipaexg00401/ipaexg.ttf"
    ckpt: str = "./outputs/RWCP-SSD/latest/ckpt"
    log: str = "./outputs/RWCP-SSD/latest/log"
    result: str = "./outputs/RWCP-SSD/latest/result"


@dataclass(frozen=True)
class DatasetConfig:
    name: str = "rwcp-ssd"
    extract_labels: tuple[str, ...] = (
        "coffmill", "cup1", "clock1", "whistle3", "maracas",
        "drum", "shaver", "trashbox", "tear", "bells5",
    )
    valtest_id: tuple[int, ...] = (13, 33, 53, 73, 93)
    confidence_score_border: float = 3.0
    acceptance_score_border: float = 2.5


@dataclass(frozen=True)
class VisualTextConfig:
    fontsize: int = 24
    stride: int = 1
    image_stretching: bool = True
    background_color: tuple[int, int, int] = (255, 255, 255)
    text_color: tuple[int, int, int] = (0, 0, 0)
    scale_in_training: str = "gray-scale"  # or "RGB-scale"


@dataclass(frozen=True)
class StftConfig:
    filter_length: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    margin_frame: int = 5


@dataclass(frozen=True)
class MelConfig:
    n_mel_channels: int = 80
    mel_fmin: float = 0.0
    mel_fmax: float = 8000.0


@dataclass(frozen=True)
class AudioConfig:
    sampling_rate: int = 22050
    max_wav_value: float = 32768.0
    stft: StftConfig = field(default_factory=StftConfig)
    mel: MelConfig = field(default_factory=MelConfig)
    energy_normalization: bool = True
    kurtosis_normalization: bool = True


@dataclass(frozen=True)
class AugmentationConfig:
    max_length: int = 7
    repeat_num: int = 3
    consecutive_num: int = 5
    first_consecutive: int = 0


@dataclass(frozen=True)
class TransformerConfig:
    encoder_layer: int = 4
    encoder_head: int = 2
    encoder_hidden: int = 256
    decoder_layer: int = 6
    decoder_head: int = 2
    decoder_hidden: int = 256
    conv_filter_size: int = 1024
    conv_kernel_size: tuple[int, int] = (9, 1)
    encoder_dropout: float = 0.2
    decoder_dropout: float = 0.2


@dataclass(frozen=True)
class VFEConfig:
    conv_kernel_size: tuple[int, int] = (3, 3)
    layer_num: int = 3


@dataclass(frozen=True)
class VariancePredictorConfig:
    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.5


@dataclass(frozen=True)
class VarianceEmbeddingConfig:
    is_kurtosis_condition: bool = False
    is_energy_condition: bool = True
    kurtosis_quantization: str = "linear"
    energy_quantization: str = "linear"
    n_bins: int = 256


@dataclass(frozen=True)
class ModelConfig:
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    visual_feature_extractor: VFEConfig = field(default_factory=VFEConfig)
    variance_predictor: VariancePredictorConfig = field(default_factory=VariancePredictorConfig)
    variance_embedding: VarianceEmbeddingConfig = field(default_factory=VarianceEmbeddingConfig)
    multi_audiotype: bool = True
    max_seq_len: int = 1000
    vocoder_model: str = "HiFi-GAN"
    vocoder_speaker: str = "universal"
    # PostNet conv width; the reference hardcodes 512 (Layers.py:75) — kept
    # configurable for reduced-size deployments (demo checkpoints)
    postnet_channels: int = 512
    # generator architecture overrides (e.g. upsample_initial_channel) for
    # self-trained reduced-size vocoders; {} = the family's published arch
    vocoder_kwargs: dict = field(default_factory=dict)
    # serve the acoustic attention core as a fused Pallas TPU kernel
    # (ops/pallas_attention.py) — inference-only, same checkpoint tree;
    # training paths ignore it (non-deterministic calls use the XLA path)
    fused_attention: bool = False


@dataclass(frozen=True)
class OptimizerConfig:
    batch_size: int = 12
    betas: tuple[float, float] = (0.9, 0.98)
    eps: float = 1e-9
    weight_decay: float = 0.0
    grad_clip_thresh: float = 1.0
    grad_acc_step: int = 1
    warm_up_step: int = 4000
    anneal_steps: tuple[int, ...] = (300000, 400000, 500000)
    anneal_rate: float = 0.3
    init_lr: float = 0.001


@dataclass(frozen=True)
class StepConfig:
    total_step: int = 200000
    log_step: int = 100
    synth_step: int = 1000
    val_step: int = 1000
    save_step: int = 10000
    # log objective quality metrics (teacher-forced mel L1 + MCD,
    # free-running DTW MCD; metrics.py) with each periodic validation —
    # beyond-reference: the reference's only quality signal is human TB
    # listening (its evaluate.py:58-103)
    val_metrics: bool = False


@dataclass(frozen=True)
class TrainConfig:
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    step: StepConfig = field(default_factory=StepConfig)
    # TPU-native replacement for the reference's `dataparallel: True`
    # (reference scripts/04_train.py:75): number of devices along the `data`
    # mesh axis; 0 = all local devices.
    data_parallel_devices: int = 0
    use_image: bool = True
    seed: int = 1234
    # "float32" (default, strict parity) or "bfloat16": compute precision of
    # the acoustic-model FFT stacks + PostNet (params/LN/softmax/loss stay
    # f32) — the TPU mixed-precision training mode the reference lacks.
    compute_dtype: str = "float32"
    # Static-shape bucketing (replaces the sort-into-groups trick at
    # reference scripts/dataset.py:187-202).
    max_text_len: int = 24
    max_mel_len: int = 1000


@dataclass(frozen=True)
class Config:
    path: PathsConfig = field(default_factory=PathsConfig)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    input_type: str = "visual-text"
    visual_text: VisualTextConfig = field(default_factory=VisualTextConfig)
    audio: AudioConfig = field(default_factory=AudioConfig)
    augmentation: AugmentationConfig = field(default_factory=AugmentationConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str | pathlib.Path) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2, default=str)


def _tupleize(value: Any) -> Any:
    if isinstance(value, list):
        return tuple(_tupleize(v) for v in value)
    if isinstance(value, dict):
        # e.g. vocoder_kwargs: nested lists (upsample_rates) must become
        # tuples — they end up as hashable flax module fields
        return {k: _tupleize(v) for k, v in value.items()}
    return value


def _build(cls, data: dict):
    """Recursively build a dataclass from a (partial) dict, keeping defaults."""
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if dataclasses.is_dataclass(f.type) if isinstance(f.type, type) else False:
            kwargs[f.name] = _build(f.type, v)
        else:
            ftype = f.type
            if isinstance(ftype, str):
                # best-effort: resolve nested dataclass types by name
                ftype = globals().get(ftype, None)
            if isinstance(ftype, type) and dataclasses.is_dataclass(ftype) and isinstance(v, dict):
                kwargs[f.name] = _build(ftype, v)
            else:
                kwargs[f.name] = _tupleize(v)
    return cls(**kwargs)


def config_from_dict(data: dict) -> Config:
    return _build(Config, data)


def load_yaml_configs(
    preprocess_yaml: str | None = None,
    model_yaml: str | None = None,
    train_yaml: str | None = None,
) -> Config:
    """Load the reference's 3-YAML layout into the unified Config.

    Mirrors the key layout of /root/reference/config/ICASSP/{preprocess,model,train}.yaml
    while resolving the legacy-schema aliases the reference left broken (SURVEY.md §5).
    """
    data: dict[str, Any] = {}

    if preprocess_yaml is not None:
        with open(preprocess_yaml) as f:
            p = yaml.safe_load(f)
        path = p.get("path", {})
        data["path"] = {
            "corpus": path.get("corpus", path.get("corpus_path", PathsConfig.corpus)),
            "formatted": path.get("formatted", path.get("formatted_data_path", PathsConfig.formatted)),
            "preprocessed": path.get("preprocessed", path.get("preprocessed_path", PathsConfig.preprocessed)),
            "font": path.get("font", PathsConfig.font),
        }
        data["dataset"] = p.get("dataset", {})
        if "input_type" in p:
            data["input_type"] = p["input_type"]
        vt = p.get("visual_text", {})
        if vt:
            data["visual_text"] = {
                "fontsize": vt.get("fontsize", 24),
                "stride": vt.get("stride", 1),
                "image_stretching": vt.get("image_stretching", True),
                "background_color": vt.get("color", {}).get("background", (255, 255, 255)),
                "text_color": vt.get("color", {}).get("text", (0, 0, 0)),
                "scale_in_training": vt.get("scale_in_training", "gray-scale"),
            }
        au = p.get("audio", {})
        if au:
            data["audio"] = {
                "sampling_rate": au.get("sampling_rate", 22050),
                "max_wav_value": au.get("max_wav_value", 32768.0),
                "stft": au.get("stft", {}),
                "mel": au.get("mel", {}),
                "energy_normalization": au.get("feature", {}).get("energy", {}).get("normalization", True),
                "kurtosis_normalization": au.get("feature", {}).get("kurtosis", {}).get("normalization", True),
            }
        if "augmentation" in p:
            data["augmentation"] = p["augmentation"]

    if model_yaml is not None:
        with open(model_yaml) as f:
            m = yaml.safe_load(f)
        data["model"] = {
            "transformer": m.get("transformer", {}),
            "visual_feature_extractor": m.get("visual_feature_extractor", {}),
            "variance_predictor": m.get("variance_predictor", {}),
            "variance_embedding": m.get("variance_embedding", {}),
            "multi_audiotype": m.get("multi_audiotype", True),
            "max_seq_len": m.get("max_seq_len", 1000),
            "vocoder_model": m.get("vocoder", {}).get("model", "HiFi-GAN"),
            "vocoder_speaker": m.get("vocoder", {}).get("speaker", "universal"),
        }

    if train_yaml is not None:
        with open(train_yaml) as f:
            t = yaml.safe_load(f)
        path = t.get("path", {})
        data.setdefault("path", {})
        data["path"].update({
            "ckpt": path.get("ckpt_path", PathsConfig.ckpt),
            "log": path.get("log_path", PathsConfig.log),
            "result": path.get("result_path", PathsConfig.result),
        })
        data["train"] = {
            "optimizer": t.get("optimizer", {}),
            "step": t.get("step", {}),
            "use_image": t.get("use_image", True),
        }

    return config_from_dict(data)


# ---------------------------------------------------------------------------
# Metadata artifacts (audiotype.json / stats.json / visual_text.json / ...)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FeatureStats:
    """min/max/mean/std of a normalized scalar feature (stats.json entry).

    Layout matches reference preprocessor.py:130-144.
    """
    min: float
    max: float
    mean: float
    std: float

    @classmethod
    def from_list(cls, v: Sequence[float]) -> "FeatureStats":
        return cls(min=float(v[0]), max=float(v[1]), mean=float(v[2]), std=float(v[3]))

    def to_list(self) -> list[float]:
        return [self.min, self.max, self.mean, self.std]


@dataclass(frozen=True)
class DatasetMetadata:
    """Preprocessed-dataset metadata bundle.

    Aggregates audiotype.json, stats.json, visual_text.json and label_width.json
    from the preprocessed directory (reference preprocessor.py:81-105,130-144).
    """
    audiotype_map: dict[str, int]
    energy_stats: FeatureStats
    kurtosis_stats: FeatureStats
    max_pixelsize: int
    image_height: int
    label_width: dict[str, tuple[float, float, float]]
    # how the training images' glyphs were produced ('font' | 'procedural' |
    # 'mixed'; None in metadata written before the stamp existed) — serving
    # warns when the serving host would render differently (ADVICE r2)
    glyph_source: str | None = None
    font_name: str | None = None

    @classmethod
    def load(cls, preprocessed_dir: str | pathlib.Path) -> "DatasetMetadata":
        d = pathlib.Path(preprocessed_dir)
        with open(d / "audiotype.json") as f:
            audiotype_map = json.load(f)
        with open(d / "stats.json") as f:
            stats = json.load(f)
        with open(d / "visual_text.json") as f:
            vt = json.load(f)
        label_width = {}
        lw_path = d / "label_width.json"
        if lw_path.exists():
            with open(lw_path) as f:
                label_width = {k: tuple(v) for k, v in json.load(f).items()}
        return cls(
            audiotype_map=audiotype_map,
            energy_stats=FeatureStats.from_list(stats["energy"]),
            kurtosis_stats=FeatureStats.from_list(stats["kurtosis"]),
            max_pixelsize=int(vt["max_pixelsize"][0]),
            image_height=int(vt["height"][0]),
            label_width=label_width,
            glyph_source=(vt.get("glyph_source") or [None])[0],
            font_name=(vt.get("font") or [None])[0],
        )

    def save(self, preprocessed_dir: str | pathlib.Path) -> None:
        d = pathlib.Path(preprocessed_dir)
        d.mkdir(parents=True, exist_ok=True)
        with open(d / "audiotype.json", "w") as f:
            json.dump(self.audiotype_map, f)
        with open(d / "stats.json", "w") as f:
            json.dump({
                "energy": self.energy_stats.to_list(),
                "kurtosis": self.kurtosis_stats.to_list(),
            }, f)
        with open(d / "visual_text.json", "w") as f:
            vt = {
                "max_pixelsize": [self.max_pixelsize],
                "height": [self.image_height],
            }
            if self.glyph_source is not None:
                vt["glyph_source"] = [self.glyph_source]
            if self.font_name is not None:
                vt["font"] = [self.font_name]
            json.dump(vt, f)
        with open(d / "label_width.json", "w") as f:
            json.dump({k: list(v) for k, v in self.label_width.items()}, f)

    @property
    def n_audiotype(self) -> int:
        return len(self.audiotype_map)
