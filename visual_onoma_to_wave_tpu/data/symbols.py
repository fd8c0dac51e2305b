"""Dynamic vocabulary built from the preprocessed metadata files.

Parity with reference scripts/utils/symbols.py:4-17: the symbol set is the
sorted union of characters appearing in train/val/test metadata; ids start
at 1 (0 is PAD, reference transformer/Constants.py:1).
"""
from __future__ import annotations

import json
import pathlib

PAD_ID = 0
SYMBOLS_FILE = "symbols.json"


def build_symbol_map(preprocessed_dir: str | pathlib.Path,
                     filenames=("train.txt", "val.txt", "test.txt")) -> dict[str, int]:
    chars: set[str] = set()
    d = pathlib.Path(preprocessed_dir)
    for fn in filenames:
        p = d / fn
        if not p.exists():
            continue
        for line in p.read_text(encoding="utf-8").splitlines():
            if not line.strip():
                continue
            fields = line.split("|")
            text = fields[4].replace("{", "").replace("}", "")
            chars.update(text)
    return {s: i + 1 for i, s in enumerate(sorted(chars))}


def encode_text(text: str, symbol_map: dict[str, int]) -> list[int]:
    clean = text.replace("{", "").replace("}", "").replace("\n", "")
    return [symbol_map[c] for c in clean]


def save_symbol_map(directory: str | pathlib.Path,
                    symbol_map: dict[str, int]) -> None:
    """Persist the vocabulary so serving does not need the split txt files
    (the reference rebuilds it from train/val/test.txt every time)."""
    p = pathlib.Path(directory) / SYMBOLS_FILE
    p.write_text(json.dumps(symbol_map, ensure_ascii=False, sort_keys=True),
                 encoding="utf-8")


def load_symbol_map(directory: str | pathlib.Path) -> dict[str, int] | None:
    """Load symbols.json from `directory`, or None if absent."""
    p = pathlib.Path(directory) / SYMBOLS_FILE
    if not p.exists():
        return None
    return {k: int(v) for k, v in
            json.loads(p.read_text(encoding="utf-8")).items()}
