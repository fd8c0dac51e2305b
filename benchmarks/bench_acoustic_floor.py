"""Acoustic-model quality floor at FULL ICASSP size (round-3 VERDICT #6).

The only committed acoustic quality number was the 2.5 M-param demo
checkpoint's MCD 67 dB — too coarse to catch regressions. This trains the
full-size model (reference config geometry, ~34 M params) on the
deterministic synthetic corpus (same generator as the demo artifacts,
examples/train_demo_artifacts.py) to --steps (default 10 000) with
val_metrics=true, logging teacher-forced mel L1 / MCD / free-running
DTW-MCD every val_step into val/metrics.jsonl, and prints the final
metrics as the framework's acoustic regression reference for BASELINE.md.

Reference anchor: the reference trains 200k steps on RWCP-SSD
(scripts/04_train.py:169-171, config/ICASSP/train.yaml:5-21); its corpus
is not distributable, so the deterministic synthetic corpus is the
reproducible stand-in — track the numbers relatively.

Usage:
    python benchmarks/bench_acoustic_floor.py [--steps 10000]
        [--n-per-class 60] [--batch 16] [--work DIR]
Prints one JSON line per phase; the last line carries the final metrics.
"""
from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "examples"))


def main() -> int:
    steps = 10_000
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    n_per_class = 60
    if "--n-per-class" in sys.argv:
        n_per_class = int(sys.argv[sys.argv.index("--n-per-class") + 1])
    batch = 16
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    work = pathlib.Path("/tmp/acoustic_floor")
    if "--work" in sys.argv:
        work = pathlib.Path(sys.argv[sys.argv.index("--work") + 1])

    from train_demo_artifacts import build_corpus, work_config

    from visual_onoma_to_wave_tpu.cli import main as cli_main

    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    raw_root, ono_root = build_corpus(work, n_per_class)
    cfg_dict = work_config(work, ono_root, steps)
    # FULL reference geometry: drop the demo shrink, keep the demo paths.
    # (work_config's model block is the small demo preset; the default
    # Config IS the ICASSP geometry, so just delete the override.)
    del cfg_dict["model"]
    cfg_dict["train"]["optimizer"]["batch_size"] = batch
    cfg_dict["train"]["step"]["val_step"] = 2000
    cfg_dict["train"]["step"]["val_metrics"] = True
    cfg_dict["train"]["step"]["save_step"] = steps
    cfg_dict["train"]["step"]["synth_step"] = 10 ** 9
    cfg_path = work / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_dict))

    t0 = time.perf_counter()
    cli_main(["format", str(cfg_path), str(raw_root)])
    cli_main(["prepare-tg", str(cfg_path)])
    cli_main(["preprocess", str(cfg_path)])
    print(json.dumps({"metric": "acoustic_floor_corpus",
                      "prep_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    # the split router sends clip numbers in dataset.valtest_id
    # (13/33/53/73/93 by default) to val/test — a too-small --n-per-class
    # produces an EMPTY val split and the final metrics would all be NaN;
    # fail before burning the training budget
    val_rows = (work / "preprocessed" / "val.txt").read_text().splitlines()
    if not val_rows:
        raise SystemExit(
            f"val split is empty (n_per_class={n_per_class} yields no clip "
            f"numbers in dataset.valtest_id) — raise --n-per-class above "
            f"the smallest valtest id")

    t0 = time.perf_counter()
    cli_main(["train", str(cfg_path)])
    train_s = time.perf_counter() - t0

    # final metrics over the val split (teacher-forced + free-running)
    from visual_onoma_to_wave_tpu.cli import load_config
    from visual_onoma_to_wave_tpu.training.trainer import Trainer
    trainer = Trainer(load_config(str(cfg_path)), restore_step=steps)
    try:
        n_params = sum(x.size for x in __import__("jax").tree.leaves(
            trainer.state.params))
        means = trainer.evaluate(metrics=True)
    finally:
        trainer.ckpt.close()
    print(json.dumps({
        "metric": "acoustic_floor_quality",
        "steps": steps, "batch": batch, "n_params": int(n_params),
        "train_wall_s": round(train_s, 1),
        "trajectory_jsonl": str(pathlib.Path(cfg_dict["path"]["log"])
                                / "val" / "metrics.jsonl"),
        **{k: round(float(v), 4) for k, v in means.items()},
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
