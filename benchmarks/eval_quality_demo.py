"""Objective quality of the committed demo checkpoint (BASELINE.md row).

Rebuilds the deterministic synthetic demo corpus (same generator + seed as
examples/train_demo_artifacts.py), preprocesses it, loads the COMMITTED
acoustic params, and reports `Trainer.evaluate(metrics=True)` over the val
split: teacher-forced mel_l1 + MCD (dB) and free-running DTW-aligned MCD
(dB) — the machine-checkable quality axis the reference lacks (its
evaluate.py only logs audio for human listening).

    python benchmarks/eval_quality_demo.py [--cpu] [--work DIR]

Prints ONE JSON line with the metric means.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "examples"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend in-process")
    ap.add_argument("--work", default="/tmp/demo_quality")
    ap.add_argument("--demo", default=str(REPO / "examples" / "checkpoints"
                                          / "demo"))
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from train_demo_artifacts import build_corpus, work_config

    from visual_onoma_to_wave_tpu.cli import main as cli_main
    from visual_onoma_to_wave_tpu.config import config_from_dict
    from visual_onoma_to_wave_tpu.training.trainer import Trainer
    from visual_onoma_to_wave_tpu.utils.checkpoint import load_params

    work = pathlib.Path(args.work)
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    raw_root, ono_root = build_corpus(work, n_per_class=60)
    cfg_dict = work_config(work, ono_root, steps=1)
    cfg_path = work / "cfg.json"
    cfg_path.write_text(json.dumps(cfg_dict))
    for argv in (["format", str(cfg_path), str(raw_root)],
                 ["prepare-tg", str(cfg_path)],
                 ["preprocess", str(cfg_path)]):
        rc = cli_main(argv)
        if rc not in (0, None):
            raise RuntimeError(f"cli {argv[0]} failed rc={rc}")

    # the regenerated corpus must match the one the checkpoint was trained
    # on — pin the normalization stats against the committed metadata
    committed = json.load(open(pathlib.Path(args.demo) / "preprocessed"
                               / "stats.json"))
    rebuilt = json.load(open(work / "preprocessed" / "stats.json"))
    for k in committed:
        a, b = committed[k], rebuilt[k]
        if any(abs(x - y) > 1e-4 for x, y in zip(a, b)):
            raise RuntimeError(
                f"regenerated corpus stats diverge from committed: {k} "
                f"{a} vs {b} — demo generator changed since the checkpoint "
                f"was trained")

    cfg = config_from_dict(cfg_dict)
    trainer = Trainer(cfg, use_mesh=False)
    try:
        loaded = load_params(pathlib.Path(args.demo) / "acoustic")
        trainer.state = trainer.state.replace(
            params=loaded["params"],
            batch_stats=loaded.get("batch_stats", {}))
        means = trainer.evaluate(metrics=True)
    finally:
        trainer.ckpt.close()
    means["val_items"] = sum(
        1 for line in (work / "preprocessed" / "val.txt")
        .read_text().splitlines() if line.strip())
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in means.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
