"""Acoustic + END-TO-END quality floor at FULL ICASSP size.

Round-3 VERDICT #6 (mel domain): the only committed acoustic quality
number was the 2.5 M-param demo checkpoint's MCD 67 dB — too coarse to
catch regressions. This trains the full-size model (reference config
geometry, ~34 M params) on the deterministic synthetic corpus (same
generator as the demo artifacts, examples/train_demo_artifacts.py) to
--steps (default 10 000) with val_metrics=true, logging teacher-forced
mel L1 / MCD / free-running DTW-MCD every val_step into val/metrics.jsonl,
and prints the final metrics as the framework's acoustic regression
reference for BASELINE.md.

Round-4 VERDICT #4 (waveform domain): with --vocoder-steps > 0 it then
trains a vocoder (--vocoder-family, family_recipe defaults) on the SAME
corpus' train-split audio and scores the waveform a user actually
receives — acoustic prediction through the trained vocoder — against the
ground-truth audio:
  * teacher-forced full stack: Trainer.evaluate(metrics=True) with the
    vocoder loaded reports mrstft_sc/_mag of the vocoded teacher-forced
    mel vs GT audio (exactly aligned — the clean number);
  * free-running full stack (the honest user path, predicted durations):
    vocode the free-running mel, re-analyze the delivered waveform and
    report DTW-aligned MCD vs the GT mel plus min-length-trimmed
    mrstft vs the GT audio (onset misalignment inflates the latter —
    read it next to the teacher-forced number).
Reference anchor: the full synth path is the reference's ONLY quality
surface, human-judged (scripts/utils/tools.py:180-241).

Reference anchor: the reference trains 200k steps on RWCP-SSD
(scripts/04_train.py:169-171, config/ICASSP/train.yaml:5-21); its corpus
is not distributable, so the deterministic synthetic corpus is the
reproducible stand-in — track the numbers relatively.

Usage:
    python benchmarks/bench_acoustic_floor.py [--steps 10000]
        [--n-per-class 60] [--batch 16] [--work DIR]
        [--vocoder-steps 4000] [--vocoder-family istftnet-mel]
Prints one JSON line per phase; the last lines carry the final metrics.
"""
from __future__ import annotations

import json
import pathlib
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "examples"))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))


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
    vocoder_steps = 4000
    if "--vocoder-steps" in sys.argv:
        vocoder_steps = int(sys.argv[sys.argv.index("--vocoder-steps") + 1])
    vocoder_family = "istftnet-mel"
    if "--vocoder-family" in sys.argv:
        vocoder_family = sys.argv[sys.argv.index("--vocoder-family") + 1]

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
    if vocoder_steps:
        # partial model block: acoustic geometry stays the full-size
        # default, only the vocoder family the full-stack phase scores
        # through is pinned (used by Trainer.evaluate's vocode pass)
        cfg_dict["model"] = {"vocoder_model": vocoder_family}
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
    # --save-audio: the vocoder phase trains on the train-split trimmed
    # waveforms and the full-stack metrics compare against the val ones
    cli_main(["preprocess", str(cfg_path)]
             + (["--save-audio"] if vocoder_steps else []))
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

    # end-to-end phase: train a vocoder on the SAME corpus' train audio
    voc_gen = voc_params = voc_div = None
    if vocoder_steps:
        voc_gen, voc_params, voc_wall, voc_div = _train_vocoder(
            work, vocoder_family, vocoder_steps)
        print(json.dumps({
            "metric": "e2e_floor_vocoder", "family": vocoder_family,
            "steps": vocoder_steps, "train_wall_s": round(voc_wall, 1),
            **({"diverged_at": voc_div} if voc_div is not None else {}),
        }), flush=True)

    # final metrics over the val split (teacher-forced + free-running);
    # with a vocoder loaded, evaluate() also reports the teacher-forced
    # FULL-STACK mrstft (vocoded TF mel vs GT audio, exactly aligned)
    from visual_onoma_to_wave_tpu.cli import load_config
    from visual_onoma_to_wave_tpu.training.trainer import Trainer
    trainer = Trainer(load_config(str(cfg_path)), restore_step=steps,
                      vocoder_params=voc_params)
    try:
        n_params = sum(x.size for x in __import__("jax").tree.leaves(
            trainer.state.params))
        means = trainer.evaluate(metrics=True)
        fr = ({} if voc_params is None
              else _free_running_full_stack(trainer, voc_gen, voc_params))
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
    if fr:
        print(json.dumps({
            "metric": "e2e_waveform_floor",
            "acoustic_steps": steps, "vocoder_family": vocoder_family,
            "vocoder_steps": vocoder_steps,
            # a watchdog halt means every full-stack number below went
            # through the COLLAPSED generator — not a usable floor
            **({"vocoder_diverged_at": voc_div}
               if voc_div is not None else {}),
            # teacher-forced full stack (from evaluate, exactly aligned)
            "tf_mrstft_sc": round(float(means["mrstft_sc"]), 4),
            "tf_mrstft_mag": round(float(means["mrstft_mag"]), 4),
            "tf_mrstft": round(float(means["mrstft_sc"]
                                     + means["mrstft_mag"]), 4),
            # free-running full stack (predicted durations, user path)
            **{k: round(float(v), 4) for k, v in fr.items()},
        }), flush=True)
    return 0


def _train_vocoder(work: pathlib.Path, family: str, steps: int):
    """Train `family` from scratch on the corpus' train-split trimmed
    waveforms with the family_recipe defaults + the divergence watchdog
    armed; returns (gen module, host params, wall seconds, diverged_at)."""
    import jax

    from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer, family_recipe)

    pre = work / "preprocessed"
    clips = []
    for line in (pre / "train.txt").read_text().splitlines():
        if not line.strip():
            continue
        name, label = line.split("|")[:2]
        p = pre / "audio" / label / f"{name}.npy"
        if p.exists():                 # augmented rows have no waveform
            clips.append(np.load(p))
    if not clips:
        raise RuntimeError("no train-split audio on disk — --save-audio "
                           "did not run?")
    recipe = family_recipe(family)
    vcfg = VocoderTrainConfig(
        total_steps=steps, batch_size=16,
        learning_rate=recipe["learning_rate"],
        grad_clip_norm=recipe["grad_clip_norm"],
        log_every=250, save_every=10 ** 9, on_divergence="halt")
    msd = None
    if recipe["disc"] == "mrd":
        from visual_onoma_to_wave_tpu.models.hifigan_disc import (
            MultiResolutionDiscriminator)
        msd = MultiResolutionDiscriminator()
    gen = get_vocoder(family)
    t0 = time.perf_counter()
    vt = VocoderTrainer(clips, vcfg, gen=gen, msd=msd, use_mesh=False)
    vt.train()
    return (gen, jax.device_get(vt.state.gen_params),
            time.perf_counter() - t0, vt.diverged_at)


def _free_running_full_stack(trainer, gen, params) -> dict:
    """Score the user-audible free-running path over the val split: run
    the acoustic model with PREDICTED durations, vocode the mel, then
    compare the delivered waveform against ground truth — DTW-aligned MCD
    of its mel re-analysis vs the GT mel (length-robust) and min-length-
    trimmed mrstft vs the GT audio (onset misalignment inflates this one;
    read it next to the teacher-forced number)."""
    import jax
    import jax.numpy as jnp

    from bench_vocoder_quality import jit_logmel

    from visual_onoma_to_wave_tpu.metrics import mcd_dtw, mrstft_distance
    from visual_onoma_to_wave_tpu.models.vocoder import vocoder_infer
    from visual_onoma_to_wave_tpu.training.trainer import _jit_batch

    acfg = trainer.config.audio
    hop = acfg.stft.hop_length
    logmel = jit_logmel(acfg.stft.filter_length, hop, acfg.stft.win_length,
                        acfg.mel.n_mel_channels, acfg.mel.mel_fmin,
                        acfg.mel.mel_fmax, acfg.sampling_rate)

    audio_root = pathlib.Path(trainer.config.path.preprocessed) / "audio"
    wave_gt = {p.stem: p for p in audio_root.glob("*/*.npy")}
    mcds, scs, mags = [], [], []
    for batch in trainer.val_ds.batches(group_size=1, shuffle=False):
        jb = trainer._place(_jit_batch(batch))
        infer_in = {k: jb[k] for k in
                    ("audiotypes", "texts", "src_lens", "image_cells")
                    if k in jb}
        out = trainer.synth_step(trainer.state, infer_in)
        # np.array (copy): device_get views are read-only, the pad mask
        # below writes in place
        fr_mel = np.array(jax.device_get(out["postnet_mel"]), np.float32)
        fr_lens = np.asarray(jax.device_get(out["mel_lens"]))
        # mask batch-pad frames to the mel floor before vocoding (same
        # receptive-halo bleed fix as Trainer.evaluate's TF pass)
        pad = np.arange(fr_mel.shape[1])[None, :] >= fr_lens[:, None]
        fr_mel[pad] = float(np.log(1e-5))
        wavs, _ = vocoder_infer(params, jnp.asarray(fr_mel), gen=gen,
                                model=trainer.config.model.vocoder_model)
        wavs = np.asarray(jax.device_get(wavs))
        gt_mels = np.asarray(batch["mels"])
        gt_lens = np.asarray(batch["mel_lens"])
        for b, name in enumerate(batch["names"]):
            p = wave_gt.get(name)
            if p is None:
                continue
            gt_wav = np.load(p)
            pred = np.clip(wavs[b, : int(fr_lens[b]) * hop], -1.0, 1.0)
            m2 = np.asarray(jax.device_get(
                logmel(jnp.asarray(pred)[None])))[0]     # (n_mels, T)
            mcds.append(mcd_dtw(m2.T, gt_mels[b, : int(gt_lens[b])]))
            n = min(len(pred), len(gt_wav))
            d = mrstft_distance(pred[:n], gt_wav[:n])
            scs.append(d["sc"])
            mags.append(d["mag"])
    if not mcds:
        raise RuntimeError("no val clips with saved audio")
    return {"fr_wav_mcd_dtw_db": float(np.mean(mcds)),
            "fr_mrstft_sc": float(np.mean(scs)),
            "fr_mrstft_mag": float(np.mean(mags)),
            "fr_mrstft": float(np.mean(scs) + np.mean(mags)),
            "val_clips_scored": len(mcds)}


if __name__ == "__main__":
    sys.exit(main())
