"""Corpus formatting: RWCP-SSD raw audio + onomatopoeia annotations -> the
formatted layout consumed by preprocessing.

Behavioral parity with reference scripts/01_format.py:
  * .raw (48 kHz/16-bit mono PCM) -> audio/<label>/<clip>.wav
  * .ono rows `worker_idx|onomatopoeia|self_score` joined with .acc rows
    `worker_idx|other_worker|score`: keep entries whose self_score > 3, and
    average the OTHER workers' acceptance scores (DCASE2020-style protocol,
    reference 01_format.py:49-73);
  * .lab files copied to lab/<label>/;
  * per-class text/<label>/data.txt rows:
      name|audio|onomatopoeia|label|self_score|others_score

The formatter registry is pluggable like the reference's dict dispatch
(01_format.py:100-109).
"""
from __future__ import annotations

import pathlib
import shutil
from collections import defaultdict
from typing import Callable

from visual_onoma_to_wave_tpu.config import Config
from visual_onoma_to_wave_tpu.data.audio_io import raw_to_wav


def _parse_ono(path: pathlib.Path) -> list[tuple[str, str, float]]:
    """Rows of worker-id, onomatopoeia, self-confidence score."""
    rows = []
    for line in path.read_text().splitlines():
        parts = line.strip().split(",")
        if len(parts) >= 3:
            rows.append((parts[0], parts[1], float(parts[2])))
    return rows


def _parse_acc(path: pathlib.Path) -> dict[str, list[float]]:
    """worker-id -> list of acceptance scores given by OTHER workers."""
    scores = defaultdict(list)
    for line in path.read_text().splitlines():
        parts = line.strip().split(",")
        if len(parts) >= 3:
            target_worker, _rater, score = parts[0], parts[1], float(parts[2])
            scores[target_worker].append(score)
    return scores


def format_rwcpssd(
    config: Config,
    audio_dir: str | pathlib.Path,
    ono_dir: str | pathlib.Path | None = None,
    self_score_border: float = 3.0,
) -> dict[str, int]:
    """Format the RWCP-SSD corpus into `config.path.formatted`.

    audio_dir: root containing <label>/<take>/*.raw (RWCP-SSD layout)
    ono_dir:   root of RWCPSSD_Onomatopoeia containing per-clip .ono/.acc/.lab
               (defaults to config.path.corpus)

    Returns {label: clip_count}.
    """
    out_root = pathlib.Path(config.path.formatted)
    ono_root = pathlib.Path(ono_dir if ono_dir is not None else config.path.corpus)
    audio_root = pathlib.Path(audio_dir)
    labels = config.dataset.extract_labels
    counts: dict[str, int] = {}

    for label in labels:
        ono_files = sorted(ono_root.glob(f"**/{label}/*.ono"))
        if not ono_files:
            continue
        (out_root / "audio" / label).mkdir(parents=True, exist_ok=True)
        (out_root / "lab" / label).mkdir(parents=True, exist_ok=True)
        (out_root / "text" / label).mkdir(parents=True, exist_ok=True)
        rows = []
        for ono_path in ono_files:
            clip = ono_path.stem
            acc_path = ono_path.with_suffix(".acc")
            acc = _parse_acc(acc_path) if acc_path.exists() else {}
            raw_candidates = list(audio_root.glob(f"**/{label}/**/{clip}.raw"))
            wav_path = out_root / "audio" / label / f"{clip}.wav"
            if raw_candidates and not wav_path.exists():
                raw_to_wav(raw_candidates[0], wav_path)
            for worker, onomatopoeia, self_score in _parse_ono(ono_path):
                if self_score <= self_score_border:
                    continue
                others = acc.get(worker, [])
                others_score = sum(others) / len(others) if others else 0.0
                name = f"{clip}-{worker}"
                lab_src = ono_path.parent / f"{clip}_{worker}.lab"
                if not lab_src.exists():
                    lab_src = ono_path.parent / f"{name}.lab"
                if lab_src.exists():
                    shutil.copy(lab_src, out_root / "lab" / label / f"{name}.lab")
                rows.append(
                    f"{name}|{clip}|{onomatopoeia}|{label}|{self_score}|{others_score}"
                )
        with open(out_root / "text" / label / "data.txt", "w") as f:
            f.write("\n".join(rows) + ("\n" if rows else ""))
        counts[label] = len(rows)
    return counts


FORMATTERS: dict[str, Callable] = {
    "rwcp-ssd": format_rwcpssd,
}


def format_dataset(config: Config, audio_dir, **kwargs) -> dict[str, int]:
    name = config.dataset.name
    if name not in FORMATTERS:
        raise KeyError(f"unknown dataset {name!r}; known: {list(FORMATTERS)}")
    return FORMATTERS[name](config, audio_dir, **kwargs)
