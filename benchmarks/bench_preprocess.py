"""Full preprocessing pipeline benchmark: synthetic formatted corpus ->
Preprocessor.build(), reporting end-to-end clips/sec (the metric tracked in
BASELINE.md; reference anchor: joblib n_jobs=10 fan-out in
/root/reference/scripts/preprocessor/preprocessor.py:64-66).

    python benchmarks/bench_preprocess.py --clips 600 --workers 10
    python benchmarks/bench_preprocess.py --platform cpu   # force CPU DSP

Prints one JSON line: {"metric": "preprocess_pipeline_clips_per_sec", ...}.
The corpus is built once under a temp dir (building time excluded); timing
covers all four passes (load/align, device DSP, render, augment, normalize,
splits).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SR = 22050
KATA = "パンドカタコツバチリン"


def build_corpus(root: pathlib.Path, n_clips: int, n_labels: int = 4,
                 seed: int = 0):
    from visual_onoma_to_wave_tpu.config import Config
    from visual_onoma_to_wave_tpu.data import Interval, write_textgrid, write_wav

    rng = np.random.default_rng(seed)
    formatted = root / "formatted"
    labels = [f"label{i}" for i in range(n_labels)]
    per = (n_clips + n_labels - 1) // n_labels
    for li, label in enumerate(labels):
        (formatted / "audio" / label).mkdir(parents=True)
        (formatted / "TextGrid" / label).mkdir(parents=True)
        (formatted / "text" / label).mkdir(parents=True)
        rows = []
        for c in range(per):
            n_chars = int(rng.integers(2, 7))
            text = "".join(rng.choice(list(KATA), n_chars))
            sec_per_char = float(rng.uniform(0.12, 0.3))
            lead = tail = 0.1
            total = lead + n_chars * sec_per_char + tail
            t = np.arange(int(total * SR)) / SR
            wav = np.zeros_like(t, dtype=np.float32)
            intervals = [Interval(0.0, lead, "")]
            cur = lead
            for i in range(n_chars):
                f = 200.0 * (1.15 ** (li * 3 + i))
                seg = (t >= cur) & (t < cur + sec_per_char)
                env = np.hanning(int(seg.sum())).astype(np.float32)
                wav[seg] = (0.5 * np.sin(2 * np.pi * f * t[seg])
                            ).astype(np.float32) * env
                intervals.append(Interval(cur, cur + sec_per_char, text[i]))
                cur += sec_per_char
            intervals.append(Interval(cur, total, ""))
            clip = f"c1_{label}_{c:03d}_0980"
            write_wav(formatted / "audio" / label / f"{clip}.wav", wav, SR)
            write_textgrid(
                intervals, formatted / "TextGrid" / label / f"{clip}_w1.TextGrid")
            rows.append(f"{clip}_w1|{clip}|{text}|{label}|5.0|4.0")
        (formatted / "text" / label / "data.txt").write_text(
            "\n".join(rows) + "\n")

    cfg = Config()
    return cfg.replace(
        path=cfg.path.__class__(
            corpus=str(root / "raw"), formatted=str(formatted),
            preprocessed=str(root / "preprocessed"), font="",
        ),
        dataset=cfg.dataset.__class__(
            extract_labels=tuple(labels), valtest_id=(13,),
            confidence_score_border=3.0, acceptance_score_border=2.5,
        ),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=600)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--platform", default=None, help="cpu to force CPU DSP")
    ap.add_argument("--repeat", type=int, default=1,
                    help="timed builds (first run pays kernel compiles; "
                    "report the best)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from visual_onoma_to_wave_tpu.data.preprocess import Preprocessor

    root = pathlib.Path(tempfile.mkdtemp(prefix="vow_prebench_"))
    try:
        cfg = build_corpus(root, args.clips)
        best = None
        for r in range(args.repeat):
            out = pathlib.Path(cfg.path.preprocessed)
            if out.exists():
                shutil.rmtree(out)
            pre = Preprocessor(cfg, num_workers=args.workers)
            t0 = time.perf_counter()
            pre.build(verbose=False)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        import jax
        cps = args.clips / best
        print(json.dumps({
            "metric": "preprocess_pipeline_clips_per_sec",
            "value": round(cps, 1),
            "unit": "clips/sec",
            "clips": args.clips,
            "workers": pre.num_workers,
            "platform": jax.devices()[0].platform,
            "seconds": round(best, 2),
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
