"""Config loading: reference 3-YAML layout, legacy-schema aliases, JSON dict.

The reference forked its config schema (SURVEY.md §5): live code reads
`path.formatted` / `audio.stft.*` while 01_format/02_prepare_tg read legacy
`path.formatted_data_path`. The unified loader must accept both spellings.
"""
import json
import pathlib

from visual_onoma_to_wave_tpu.config import (
    Config,
    config_from_dict,
    load_yaml_configs,
)


def _write(p: pathlib.Path, text: str) -> str:
    p.write_text(text)
    return str(p)


def test_yaml_triple_icassp_schema(tmp_path):
    pre = _write(tmp_path / "preprocess.yaml", """
path:
  corpus: /data/corpus
  formatted: /data/formatted
  preprocessed: /data/pre
  font: /fonts/ipaexg.ttf
visual_text:
  fontsize: 24
  image_stretching: true
  color:
    background: [255, 255, 255]
    text: [0, 0, 0]
audio:
  sampling_rate: 22050
  stft:
    filter_length: 1024
    hop_length: 256
    win_length: 1024
  mel:
    n_mel_channels: 80
    mel_fmin: 0
    mel_fmax: 8000
""")
    mod = _write(tmp_path / "model.yaml", """
transformer:
  encoder_layer: 4
  decoder_layer: 6
  encoder_hidden: 256
max_seq_len: 1000
vocoder:
  model: HiFi-GAN
  speaker: universal
""")
    tra = _write(tmp_path / "train.yaml", """
path:
  ckpt_path: /out/ckpt
  log_path: /out/log
  result_path: /out/result
optimizer:
  batch_size: 12
  warm_up_step: 4000
  anneal_steps: [300000, 400000, 500000]
  anneal_rate: 0.3
step:
  total_step: 200000
  save_step: 10000
use_image: true
""")
    cfg = load_yaml_configs(pre, mod, tra)
    assert cfg.path.formatted == "/data/formatted"
    assert cfg.path.ckpt == "/out/ckpt"
    assert cfg.audio.stft.filter_length == 1024
    assert cfg.audio.mel.mel_fmax == 8000
    assert cfg.model.transformer.encoder_layer == 4
    assert cfg.model.vocoder_model == "HiFi-GAN"
    assert cfg.train.optimizer.batch_size == 12
    assert tuple(cfg.train.optimizer.anneal_steps) == (300000, 400000, 500000)
    assert cfg.train.step.total_step == 200000
    assert cfg.visual_text.background_color == (255, 255, 255)


def test_yaml_legacy_path_aliases(tmp_path):
    pre = _write(tmp_path / "preprocess.yaml", """
path:
  corpus_path: /legacy/corpus
  formatted_data_path: /legacy/formatted
  preprocessed_path: /legacy/pre
""")
    cfg = load_yaml_configs(pre, None, None)
    assert cfg.path.corpus == "/legacy/corpus"
    assert cfg.path.formatted == "/legacy/formatted"
    assert cfg.path.preprocessed == "/legacy/pre"


def test_config_from_dict_partial_keeps_defaults():
    cfg = config_from_dict({"train": {"optimizer": {"batch_size": 7}}})
    assert cfg.train.optimizer.batch_size == 7
    # untouched defaults survive
    d = Config()
    assert cfg.train.optimizer.warm_up_step == d.train.optimizer.warm_up_step
    assert cfg.audio.stft.hop_length == d.audio.stft.hop_length


def test_config_json_roundtrip_via_cli_loader(tmp_path):
    from visual_onoma_to_wave_tpu.cli import load_config
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(
        {"model": {"max_seq_len": 512}, "train": {"use_image": False}}))
    cfg = load_config(str(p))
    assert cfg.model.max_seq_len == 512
    assert cfg.train.use_image is False
