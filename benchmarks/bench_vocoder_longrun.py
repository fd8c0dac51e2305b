"""Long-budget vocoder training arms (round-3 VERDICT #4): ground the
200k-regime claims that were extrapolated from 2000-step runs.

Trains each family FROM SCRATCH to --steps (default 20 000) GAN steps with
generator EMA running at --ema (default 0.9999, the published 200k-recipe
decay), and scores copy-synthesis on the held-out clips every --every
steps — BOTH the raw iterate and the EMA iterate, in mel (mel L1, MCD) and
waveform (multi-resolution STFT) domains. One JSON line per
(family, step, iterate).

This answers two round-3 hedges with data (BASELINE.md):
  * does the 2000-step family ranking (Vocos/iSTFTNet-mel ahead of
    HiFi-GAN V1) hold at 10x budget, or was it a fast-start artifact?
  * is "EMA-0.9999's regime is the long run" true — i.e. does the EMA
    iterate overtake the raw one once past the convergence transient?

Corpus/scoring identical to benchmarks/bench_vocoder_quality.py (imported
from it): 24 structured bell/drum clips, 4 held out.

Usage:
    python benchmarks/bench_vocoder_longrun.py \
        [--families vocos,hifigan] [--steps 20000] [--every 2000] \
        [--ema 0.9999] [--batch 16] [--lr 2e-4] [--clip 0] [--disc msd|mrd]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

# shared corpus + scoring harness — the long-run and matched-budget
# numbers stay comparable by construction
from bench_vocoder_quality import corpus_and_gt, make_scorer  # noqa: E402


def main() -> int:
    from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer)

    steps = 20_000
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    every = 2_000
    if "--every" in sys.argv:
        every = int(sys.argv[sys.argv.index("--every") + 1])
    batch = 16
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    families = ["vocos", "hifigan"]
    if "--families" in sys.argv:
        families = sys.argv[sys.argv.index("--families") + 1].split(",")
    ema_decay = 0.9999
    if "--ema" in sys.argv:
        ema_decay = float(sys.argv[sys.argv.index("--ema") + 1])
    # recipe knobs, mirroring bench_vocoder_quality.py — a BigVGAN arm
    # needs the paper recipe (--lr 1e-4 --clip 1e3 --disc mrd): the flat
    # HiFi-GAN 2e-4 recipe diverges it (BASELINE.md)
    lr = 2e-4
    if "--lr" in sys.argv:
        lr = float(sys.argv[sys.argv.index("--lr") + 1])
    clip = 0.0
    if "--clip" in sys.argv:
        clip = float(sys.argv[sys.argv.index("--clip") + 1])
    disc = "msd"
    if "--disc" in sys.argv:
        disc = sys.argv[sys.argv.index("--disc") + 1]
    # watchdog margins: the defaults (4x / 5 windows) are validated on the
    # 20k arms; a 200k reference-regime run can widen them (e.g. --factor 6
    # --patience 8) so a late healthy transient cannot cost the run — the
    # measured collapses sit at 8-10x best and never recover, so they are
    # still caught within ~2k steps at log_every=250
    factor = 4.0
    if "--factor" in sys.argv:
        factor = float(sys.argv[sys.argv.index("--factor") + 1])
    patience = 5
    if "--patience" in sys.argv:
        patience = int(sys.argv[sys.argv.index("--patience") + 1])
    # --ckpt DIR: periodic checkpoints at the scoring cadence + auto-resume
    # from the latest one — a 200k reference-regime arm runs ~5.5 h over a
    # tunnel that has measured multi-hour outages (CLAUDE.md), so an
    # interrupted run must cost at most one scoring window, not the run
    ckpt_root = None
    if "--ckpt" in sys.argv:
        ckpt_root = pathlib.Path(sys.argv[sys.argv.index("--ckpt") + 1])

    # divergence watchdog ARMED (round-4 VERDICT: the flat-recipe
    # istftnet-mel arm burned ~10k steps of frozen output before the
    # budget ended it) — log_every=250 keeps the detection latency at
    # ~1.5-3.5k steps for both the late (factor-over-best) and early
    # (absolute-ceiling past 10 windows = 2.5k steps) collapse shapes
    cfg = VocoderTrainConfig(total_steps=steps, batch_size=batch,
                             save_every=every if ckpt_root else 10 ** 9,
                             log_every=250,
                             ema_decay=ema_decay,
                             on_divergence="halt",
                             divergence_factor=factor,
                             divergence_patience=patience,
                             learning_rate=lr, grad_clip_norm=clip)
    train_clips, gt, logmel = corpus_and_gt(cfg)

    msd = None
    if disc == "mrd":
        from visual_onoma_to_wave_tpu.models.hifigan_disc import (
            MultiResolutionDiscriminator)
        msd = MultiResolutionDiscriminator()

    for family in families:
        gen = (get_vocoder(family) if family != "hifigan" else None)
        ckpt_dir = ckpt_root / family if ckpt_root else None
        done, prior_wall = 0, 0.0
        ckpt_steps = (sorted(int(p.name) for p in ckpt_dir.iterdir()
                             if p.is_dir() and p.name.isdigit())
                      if ckpt_dir is not None and ckpt_dir.is_dir() else [])
        if ckpt_steps and (ckpt_dir / str(ckpt_steps[-1])
                           / "HALTED.json").exists():
            # the previous process halted on divergence: the latest
            # checkpoint is the collapsed state (restore() refuses it) —
            # report and move on instead of re-burning the budget
            print(json.dumps({
                "metric": "vocoder_longrun_halted", "family": family,
                "diverged_at": ckpt_steps[-1], "lr": lr, "clip": clip,
                "note": "halt marker found on disk; not resuming"}),
                flush=True)
            continue
        vt = VocoderTrainer(train_clips, cfg, gen=gen, msd=msd,
                            ckpt_dir=ckpt_dir, use_mesh=False)
        if ckpt_steps:
            done = vt.restore()
            wall_file = ckpt_dir / "wall.json"
            if wall_file.exists():
                prior_wall = json.loads(wall_file.read_text())["wall_s"]
            print(json.dumps({"metric": "vocoder_longrun_resumed",
                              "family": family, "step": done,
                              "prior_wall_s": round(prior_wall, 1)}),
                  flush=True)
        score = make_scorer(vt.gen, gt, logmel)

        t0 = time.perf_counter() - prior_wall
        for target in range(every, steps + 1, every):
            if target <= done:
                continue                  # already scored before the resume
            vt.train(steps=target)
            wall = time.perf_counter() - t0
            if ckpt_dir is not None:
                (ckpt_dir / "wall.json").write_text(
                    json.dumps({"wall_s": wall}))
                # keep only the two newest periodic checkpoints (~1.6 GB
                # each at iSTFTNet-mel size): resume only ever needs the
                # latest; the previous one guards a mid-save crash
                kept = sorted((int(p.name) for p in ckpt_dir.iterdir()
                               if p.is_dir() and p.name.isdigit()))
                for old in kept[:-2]:
                    import shutil
                    shutil.rmtree(ckpt_dir / str(old))
            actual = int(__import__("jax").device_get(vt.state.step))
            variants = [("raw", vt.state.gen_params)]
            if vt.state.gen_ema is not None:
                variants.append(("ema", vt.state.gen_ema))
            for tag, params in variants:
                print(json.dumps({
                    "metric": "vocoder_longrun_quality",
                    "family": family, "step": actual, "iterate": tag,
                    "ema_decay": ema_decay, "batch": batch,
                    "lr": lr, "clip": clip, "disc": disc,
                    "train_wall_s": round(wall, 1),
                    **({"diverged_at": vt.diverged_at}
                       if vt.diverged_at is not None else {}),
                    **score(params),
                }), flush=True)
            if vt.diverged_at is not None:
                # the watchdog halted the run: the scores above are the
                # collapsed state (forensics); stop burning the budget
                print(json.dumps({
                    "metric": "vocoder_longrun_halted",
                    "family": family, "diverged_at": vt.diverged_at,
                    "lr": lr, "clip": clip,
                }), flush=True)
                break
    return 0


if __name__ == "__main__":
    sys.exit(main())
