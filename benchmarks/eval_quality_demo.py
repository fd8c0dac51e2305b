"""Objective quality of the committed demo checkpoints (BASELINE.md row).

Rebuilds the deterministic synthetic demo corpus (same generator + seed as
examples/train_demo_artifacts.py), preprocesses it (--save-audio), loads
the COMMITTED acoustic params, and reports `Trainer.evaluate(metrics=True)`
over the val split: teacher-forced mel_l1 + MCD (dB) and free-running
DTW-aligned MCD (dB) — the machine-checkable quality axis the reference
lacks (its evaluate.py only logs audio for human listening).

It then scores ALL THREE committed vocoder checkpoints (HiFi-GAN,
iSTFTNet-mel, Vocos) by copy-synthesis on the val clips — vocode each
clip's ground-truth log-mel and compare the delivered waveform against the
trimmed ground-truth audio in BOTH domains: mel re-analysis (mel L1, MCD)
and multi-resolution STFT distance (mrstft sc/mag) — so the waveform-domain
metric that reversed the family ranking (BASELINE.md round-4 re-ranking
row) also guards the committed artifacts.

    python benchmarks/eval_quality_demo.py [--cpu] [--work DIR]

Prints ONE JSON line with the metric means; every value is asserted
finite.
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
                 ["preprocess", str(cfg_path), "--save-audio"]):
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

    # --- copy-synthesis gate for the three committed vocoders ------------
    means["vocoders"] = _score_committed_vocoders(
        pathlib.Path(args.demo), work, cfg.audio)

    def _walk_finite(v, path=""):
        if isinstance(v, dict):
            for k, x in v.items():
                _walk_finite(x, f"{path}.{k}")
        elif isinstance(v, float):
            assert v == v and abs(v) != float("inf"), \
                f"non-finite metric at {path}: {v}"
    _walk_finite(means)

    def _round(v):
        if isinstance(v, dict):
            return {k: _round(x) for k, x in v.items()}
        return round(v, 4) if isinstance(v, float) else v
    print(json.dumps(_round(means)))
    return 0


def _score_committed_vocoders(demo: pathlib.Path, work: pathlib.Path,
                              audio_cfg) -> dict:
    """Copy-synthesis quality of each committed vocoder checkpoint over the
    demo val clips: GT audio -> log-mel -> vocoder -> waveform, scored in
    the mel domain (re-analysis mel L1 / MCD) and the waveform domain
    (multi-resolution STFT distance) through bench_vocoder_quality's
    shared make_scorer — the demo gate and the matched-budget family
    numbers stay comparable by construction."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, str(REPO / "benchmarks"))
    from bench_vocoder_quality import jit_logmel, make_scorer

    from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
    from visual_onoma_to_wave_tpu.utils.checkpoint import load_params

    hop = audio_cfg.stft.hop_length
    logmel = jit_logmel(audio_cfg.stft.filter_length, hop,
                        audio_cfg.stft.win_length,
                        audio_cfg.mel.n_mel_channels,
                        audio_cfg.mel.mel_fmin, audio_cfg.mel.mel_fmax,
                        audio_cfg.sampling_rate)

    # val clips with saved trimmed audio (feature-space augmentations have
    # none — preprocess --save-audio writes originals only), as the
    # (audio, gt_mel) pairs make_scorer consumes; hop-trimmed so vocoded
    # length == clip length exactly
    audio_root = work / "preprocessed" / "audio"
    gt = []
    for line in (work / "preprocessed" / "val.txt").read_text().splitlines():
        if not line.strip():
            continue
        name, label = line.split("|")[:2]
        p = audio_root / label / f"{name}.npy"
        if not p.exists():
            continue
        wav = np.asarray(np.load(p), np.float32)
        t = len(wav) // hop
        wav = wav[: t * hop]
        mel = np.asarray(jax.device_get(
            logmel(jnp.asarray(wav)[None])))[0]          # (n_mels, T)
        gt.append((wav, mel))
    assert gt, "no val clips with saved audio — preprocess --save-audio?"

    # (json tag, committed config file, checkpoint dir)
    committed = [("hifigan", "config.json", "vocoder"),
                 ("istftnet_mel", "config_istftnet.json",
                  "vocoder_istftnet_mel"),
                 ("vocos", "config_vocos.json", "vocoder_vocos")]
    out = {}
    for tag, cfg_file, ckpt in committed:
        model_blk = json.load(open(demo / cfg_file))["model"]
        family = model_blk.get("vocoder_model") or "HiFi-GAN"
        gen = get_vocoder(family, **dict(model_blk.get("vocoder_kwargs")
                                         or {}))
        params = load_params(demo / ckpt)
        score = make_scorer(gen, gt, logmel)
        out[tag] = {"family": family, "clips": len(gt), **score(params)}
    return out


if __name__ == "__main__":
    raise SystemExit(main())
