"""Training batch-loader throughput: serial vs process-pool assembly.

Builds a synthetic preprocessed corpus with ICASSP-like shapes (80-mel
clips of ~512 frames, ~8-16 chars, 24x102 glyph cells), then measures
batch-assembly throughput (np.load + PNG decode + cell fill + collate,
no device work):

  * serial iterator (what a 1-core host runs);
  * ProcessLoader with N spawn workers (pool forced on so the scaling is
    measurable on any host).

Reports mel-frames/sec of assembled batches — compare against the train
step's device frames/sec (docs/PERF.md) to size num_workers: the loader
feeds the device when assembly_fps * workers > step_fps.

    python benchmarks/bench_loader.py [--clips 512] [--workers 1 2 4]
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build_corpus(root: pathlib.Path, n_clips: int, seed: int = 0):
    from PIL import Image

    from visual_onoma_to_wave_tpu.config import DatasetMetadata, FeatureStats

    rng = np.random.default_rng(seed)
    label = "drum"
    n_mels, height, cell_width = 80, 24, 102
    for sub in ("mel", "duration", "energy", "kurtosis"):
        (root / sub / label).mkdir(parents=True, exist_ok=True)
    (root / "image" / "png" / label).mkdir(parents=True, exist_ok=True)
    (root / "image" / "width" / label).mkdir(parents=True, exist_ok=True)
    rows = []
    kata = "パンドトカバチリコウシポ"
    for i in range(n_clips):
        C = int(rng.integers(6, 17))
        text = "".join(rng.choice(list(kata), C))
        dur = rng.integers(20, 50, C).astype(np.int32)   # ~480 frames mean
        T = int(dur.sum())
        name = f"f_24pt_c1-{label}-{i:05d}-x"
        np.save(root / "mel" / label / f"{name}.npy",
                rng.standard_normal((T, n_mels)).astype(np.float32))
        np.save(root / "duration" / label / f"{name}.npy", dur)
        np.save(root / "energy" / label / f"{name}.npy",
                rng.standard_normal(C).astype(np.float32))
        np.save(root / "kurtosis" / label / f"{name}.npy",
                rng.standard_normal(C).astype(np.float32))
        widths = rng.integers(40, cell_width, C).astype(np.int64)
        np.save(root / "image" / "width" / label / f"{name}.npy", widths)
        img = Image.fromarray(
            rng.integers(0, 255, (height, int(widths.sum())), np.uint8))
        img.save(root / "image" / "png" / label / f"{name}.png",
                 compress_level=1)
        rows.append(f"{name}|{label}|24|f|{text}")
    (root / "train.txt").write_text("\n".join(rows) + "\n")
    (root / "val.txt").write_text("")
    (root / "test.txt").write_text("")
    meta = DatasetMetadata(
        audiotype_map={label: 0},
        energy_stats=FeatureStats(-2, 2, 0, 1),
        kurtosis_stats=FeatureStats(-2, 2, 0, 1),
        max_pixelsize=cell_width, image_height=height,
        label_width={label: (4.0, 90.0, 30.0)})
    meta.save(root)


def measure(loader_epoch) -> tuple[float, int, int]:
    t0 = time.perf_counter()
    frames = batches = 0
    for batch in loader_epoch:
        frames += int(np.sum(batch["mel_lens"]))
        batches += 1
    return time.perf_counter() - t0, frames, batches


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--workers", type=int, nargs="*", default=[2, 4])
    args = ap.parse_args()

    import visual_onoma_to_wave_tpu.data.loader as loader_mod
    from visual_onoma_to_wave_tpu.config import Config
    from visual_onoma_to_wave_tpu.data.dataset import OnomaDataset

    td = tempfile.mkdtemp(prefix="vow_bench_loader_")
    root = pathlib.Path(td)
    build_corpus(root, args.clips)
    cfg = Config()
    cfg = cfg.replace(
        path=cfg.path.__class__(preprocessed=str(root), font=""),
        train=dataclasses.replace(
            cfg.train, optimizer=cfg.train.optimizer.__class__(
                batch_size=args.batch_size)))
    ds = OnomaDataset("train.txt", cfg, sort=True, drop_last=True)

    out = {"metric": "loader_frames_per_sec", "clips": args.clips,
           "batch_size": args.batch_size}
    # warm the page cache so serial vs pooled read the same bytes
    dt, frames, nb = measure(ds.batches(group_size=4, seed=0))
    dt, frames, nb = measure(ds.batches(group_size=4, seed=0))
    out["serial"] = {"frames_per_sec": round(frames / dt),
                     "batches_per_sec": round(nb / dt, 2)}

    loader_mod._cpu_count_real = loader_mod._cpu_count
    loader_mod._cpu_count = lambda: 64            # force the pool on
    loader_mod.ProcessLoader.MIN_BATCHES_FOR_PROCS = 1
    for w in args.workers:
        with loader_mod.ProcessLoader(ds, "train.txt",
                                      num_workers=w) as loader:
            if loader.backend != "process":
                out[f"pool_{w}"] = "unavailable"
                continue
            dt, frames, nb = measure(loader.epoch(group_size=4, seed=0))
            dt, frames, nb = measure(loader.epoch(group_size=4, seed=0))
            out[f"pool_{w}"] = {"frames_per_sec": round(frames / dt),
                                "batches_per_sec": round(nb / dt, 2)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
