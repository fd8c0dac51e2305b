"""Build the committed demo checkpoints (examples/checkpoints/demo/).

The reference ships pretrained weights via `setup.sh` downloads
(reference setup.sh:1-5 — both blobs are stripped here, and the RWCP-SSD
corpus is not distributable), so this framework trains its OWN demo
artifacts end-to-end on a synthetic onomatopoeia corpus with a real
char -> timbre correspondence:

  * every katakana character maps to a fixed chromatic pitch
    (220 Hz * 2^(k/12)); the audiotype class controls the envelope/timbre
    (drum = damped noise-burst strike, bell = slow-decay harmonic stack);
  * per-character segment durations vary per clip, so the visual widths
    (character width ∝ duration — the paper's core conditioning) carry
    real information;
  * glyphs come from the renderer's deterministic procedural fallback
    (no CJK font is installed; see data/renderer.py).

Pipeline: corpus -> cli format -> prepare-tg -> preprocess -> cli train
(small acoustic model) + VocoderTrainer (small HiFi-GAN) -> export
{config.json, preprocessed metadata, acoustic/, vocoder/} + a smoke-test
sample. The committed artifacts make `cli demo` / `cli synthesize` /
`cli serve` work out of the box:

    python -m visual_onoma_to_wave_tpu.cli demo \
        examples/checkpoints/demo/config.json \
        --acoustic examples/checkpoints/demo/acoustic \
        --vocoder  examples/checkpoints/demo/vocoder

Rebuild (≈20-30 min on one TPU chip, also runs on CPU):
    python examples/train_demo_artifacts.py --steps 3000 --voc-steps 2000
"""
from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

SR_RAW = 48000
KATAKANA = "パンドトカバチリコウシポ"
CLASSES = ("drum", "bell")

# demo model: small but real (the full ICASSP config is 34.3 M params;
# this is ~2.5 M so the committed blobs stay ~10 MB)
DEMO_MODEL = {
    "transformer": {"encoder_layer": 2, "decoder_layer": 2,
                    "encoder_head": 2, "decoder_head": 2,
                    "encoder_hidden": 128, "decoder_hidden": 128,
                    "conv_filter_size": 512, "conv_kernel_size": [9, 1]},
    "visual_feature_extractor": {"layer_num": 2},
    "max_seq_len": 512,
    "postnet_channels": 128,
    "vocoder_kwargs": {"upsample_initial_channel": 128},
}

# alternate demo vocoders: the beyond-reference fast families at demo
# size — committed as vocoder_<tag>/ + config_<tag>.json so they work out
# of the box too (same acoustic checkpoint; swap the two paths)
ALT_VOCODERS = [
    {"family": "iSTFTNet-mel",
     "kwargs": {"upsample_initial_channel": 64},
     "params_dir": "vocoder_istftnet_mel",
     "config_name": "config_istftnet.json"},
    {"family": "Vocos",
     "kwargs": {"dim": 128, "intermediate_dim": 384, "num_layers": 4},
     "params_dir": "vocoder_vocos",
     "config_name": "config_vocos.json"},
]


def train_alt_vocoder(work: pathlib.Path, out: pathlib.Path, spec: dict,
                      steps: int = 2500) -> None:
    """Train + export one alternate demo vocoder. Requires the formatted
    corpus under `work` and the exported demo (config.json) under `out`."""
    from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer, load_wav_dir)
    from visual_onoma_to_wave_tpu.utils.checkpoint import save_params

    vcfg = VocoderTrainConfig(total_steps=steps, batch_size=16,
                              save_every=10 ** 9, log_every=200)
    clips = load_wav_dir(work / "formatted" / "audio",
                         target_sr=vcfg.sampling_rate)
    gen = get_vocoder(spec["family"], **spec["kwargs"])
    vt = VocoderTrainer(clips, vcfg, gen=gen,
                        ckpt_dir=work / "out" / f"voc_{spec['params_dir']}")
    vt.train()
    save_params(out / spec["params_dir"], vt.state.gen_params)

    cfg = json.loads((out / "config.json").read_text())
    cfg["model"]["vocoder_model"] = spec["family"]
    cfg["model"]["vocoder_kwargs"] = dict(spec["kwargs"])
    (out / spec["config_name"]).write_text(json.dumps(cfg, indent=1))


def _pitch(ch: str) -> float:
    """Injective char -> pitch over KATAKANA: each demo character gets its
    own chromatic step (collisions would silently merge timbres and erase
    the char -> sound correspondence the demo claims)."""
    k = KATAKANA.index(ch) if ch in KATAKANA else ord(ch) % 24
    return 220.0 * 2.0 ** (k / 12.0)


def _char_tone(cls: str, f: float, n: int, rng) -> np.ndarray:
    t = np.arange(n) / SR_RAW
    if cls == "drum":
        env = np.exp(-t * 18.0)
        tone = np.sin(2 * np.pi * f * t)
        noise = rng.normal(0, 0.25, n) * np.exp(-t * 60.0)
        out = (0.6 * tone + noise) * env
    else:  # bell: harmonic stack, slow decay
        env = np.exp(-t * 6.0)
        out = env * sum(a * np.sin(2 * np.pi * f * h * t)
                        for a, h in ((0.6, 1.0), (0.25, 2.76), (0.15, 5.40)))
    return (0.7 * out).astype(np.float32)


def synth_clip(rng, text: str, cls: str):
    """48 kHz clip + julius-style .lab lines; per-char durations vary."""
    lead = tail = 0.10
    durs = rng.uniform(0.12, 0.28, len(text))
    total = lead + float(durs.sum()) + tail
    wav = np.zeros(int(total * SR_RAW), np.float32)
    lab = [f"0.0000 {lead:.4f} silB"]
    cur = lead
    for ch, d in zip(text, durs):
        i0 = int(cur * SR_RAW)
        n = int(d * SR_RAW)
        wav[i0:i0 + n] += _char_tone(cls, _pitch(ch), n, rng)
        lab.append(f"{cur:.4f} {cur + d:.4f} {ch}")
        cur += float(d)
    lab.append(f"{cur:.4f} {total:.4f} silE")
    return np.clip(wav, -1, 1), lab


def build_corpus(root: pathlib.Path, n_per_class: int, seed: int = 0):
    """Deterministic corpus in the REAL RWCP-SSD layout (see 01_format.py /
    data/formatting.py): audio under nospeech/drysrc/<take>/<cls>/48khz/,
    4-field .ono rows keyed by onomatopoeia_id, 4-field .acc rows, labs
    named <clip>-<onomatopoeia_id>.lab next to the .ono files."""
    raw_root = root / "RWCP-SSD"
    ono_root = root / "onoma"
    rng = np.random.default_rng(seed)
    for cls in CLASSES:
        d48 = raw_root / "nospeech" / "drysrc" / "c1" / cls / "48khz"
        d48.mkdir(parents=True, exist_ok=True)
        od = ono_root / "c1" / cls
        od.mkdir(parents=True, exist_ok=True)
        for k in range(n_per_class):
            n_chars = int(rng.integers(2, 6))
            text = "".join(rng.choice(list(KATAKANA), n_chars))
            wav, lab = synth_clip(rng, text, cls)
            num, ono_id = f"{k:03d}", f"0704_{k:03d}"
            (d48 / f"{num}.raw").write_bytes(
                (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes())
            (od / f"{num}.ono").write_text(f"w1,{ono_id},{text},5\n")
            (od / f"{num}.acc").write_text(
                f"{ono_id},{text},w2,4\n{ono_id},{text},w3,5\n")
            (od / f"{num}-{ono_id}.lab").write_text("\n".join(lab) + "\n")
    return raw_root, ono_root


def work_config(root: pathlib.Path, ono_root, steps: int) -> dict:
    return {
        "path": {
            "corpus": str(ono_root),
            "formatted": str(root / "formatted"),
            "preprocessed": str(root / "preprocessed"),
            "font": "",
            "ckpt": str(root / "out" / "ckpt"),
            "log": str(root / "out" / "log"),
            "result": str(root / "out" / "result"),
        },
        "dataset": {"extract_labels": list(CLASSES), "valtest_id": [13, 33],
                    "confidence_score_border": 3.0,
                    "acceptance_score_border": 2.5},
        "model": DEMO_MODEL,
        "train": {
            "optimizer": {"batch_size": 16, "warm_up_step": 400},
            "step": {"total_step": steps, "log_step": 200,
                     "synth_step": 10**9, "val_step": max(500, steps // 4),
                     "save_step": steps},
            "max_mel_len": 512, "seed": 0,
        },
    }


def _smoke_alt(out: pathlib.Path, alt_specs: list[dict]) -> None:
    """Serve one utterance through each alternate vocoder's config via the
    standalone checkpoint entry (what a fresh clone runs)."""
    from visual_onoma_to_wave_tpu.cli import load_config
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    for spec in alt_specs:
        alt = Synthesizer.from_checkpoint(
            load_config(str(out / spec["config_name"])),
            acoustic=str(out / "acoustic"),
            vocoder=str(out / spec["params_dir"]))
        alt_res = alt.synthesize("パンパン", CLASSES[0])
        if alt_res.wav is not None:
            assert np.isfinite(alt_res.wav).all()
            print(f"alt vocoder {spec['family']} ok "
                  f"({alt_res.mel_len} mel frames)")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--voc-steps", type=int, default=2000)
    ap.add_argument("--alt-voc-steps", type=int, default=2000,
                    help="per-family alternate demo vocoder steps "
                         "(0 skips them)")
    ap.add_argument("--alt-families", default=None,
                    help="comma-separated ALT_VOCODERS families to train "
                         "(default: all)")
    ap.add_argument("--only-alt", action="store_true",
                    help="retrain only the alternate vocoders against an "
                         "EXISTING demo export in --out (rebuilds the "
                         "deterministic corpus + `cli format`, skips "
                         "preprocess/acoustic/base-vocoder)")
    ap.add_argument("--n-per-class", type=int, default=60)
    ap.add_argument("--work", default="/tmp/demo_build")
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parent / "checkpoints" / "demo"))
    args = ap.parse_args()

    from visual_onoma_to_wave_tpu.cli import main as cli_main

    alt_specs = [s for s in ALT_VOCODERS
                 if args.alt_families is None
                 or s["family"] in args.alt_families.split(",")]

    work = pathlib.Path(args.work)
    shutil.rmtree(work, ignore_errors=True)
    work.mkdir(parents=True)
    raw_root, ono_root = build_corpus(work, args.n_per_class)
    cfg = work_config(work, ono_root, args.steps)
    cfg_path = work / "cfg.json"
    cfg_path.write_text(json.dumps(cfg, indent=1))

    if args.only_alt:
        out = pathlib.Path(args.out)
        if not (out / "config.json").exists():
            raise SystemExit(f"--only-alt needs an existing demo export "
                             f"(no config.json in {out})")
        print("== format (corpus for alt vocoders) ==", flush=True)
        rc = cli_main(["format", str(cfg_path), str(raw_root)])
        if rc not in (0, None):
            raise RuntimeError(f"cli format failed with rc={rc}")
        for spec in alt_specs:
            print(f"== train alt vocoder ({spec['family']}) ==", flush=True)
            train_alt_vocoder(work, out, spec, steps=args.alt_voc_steps)
        _smoke_alt(out, alt_specs)
        return 0

    print("== format / prepare-tg / preprocess ==", flush=True)
    for argv in (["format", str(cfg_path), str(raw_root)],
                 ["prepare-tg", str(cfg_path)],
                 ["preprocess", str(cfg_path)]):
        rc = cli_main(argv)
        if rc not in (0, None):
            raise RuntimeError(f"cli {argv[0]} failed with rc={rc}")

    print("== train acoustic ==", flush=True)
    rc = cli_main(["train", str(cfg_path)])
    if rc not in (0, None):
        raise RuntimeError(f"cli train failed with rc={rc}")

    print("== train vocoder ==", flush=True)
    from visual_onoma_to_wave_tpu.models.hifigan import HiFiGANGenerator
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer, load_wav_dir)
    vcfg = VocoderTrainConfig(total_steps=args.voc_steps, batch_size=16,
                              save_every=10**9, log_every=200)
    clips = load_wav_dir(work / "formatted" / "audio",
                         target_sr=vcfg.sampling_rate)
    gen = HiFiGANGenerator(**{k: tuple(v) if isinstance(v, list) else v
                              for k, v in DEMO_MODEL["vocoder_kwargs"].items()})
    vt = VocoderTrainer(clips, vcfg, gen=gen,
                        ckpt_dir=work / "out" / "voc_ckpt")
    vt.train()

    print("== export ==", flush=True)
    from visual_onoma_to_wave_tpu.utils.checkpoint import (
        CheckpointManager, save_params)
    out = pathlib.Path(args.out)
    shutil.rmtree(out, ignore_errors=True)
    (out / "preprocessed").mkdir(parents=True)
    pre = work / "preprocessed"
    for f in ("audiotype.json", "stats.json", "visual_text.json",
              "label_width.json", "symbols.json",
              "train.txt", "val.txt", "test.txt"):
        if (pre / f).exists():
            shutil.copy(pre / f, out / "preprocessed" / f)

    mgr = CheckpointManager(cfg["path"]["ckpt"])
    try:
        tree = mgr.restore_raw(None)
    finally:
        mgr.close()
    # save_params pulls arrays to host itself (portable checkpoints)
    save_params(out / "acoustic", {"params": tree["params"],
                                   "batch_stats": tree.get("batch_stats", {})})
    save_params(out / "vocoder", vt.state.gen_params)

    demo_cfg = dict(cfg)
    # keep the committed config portable: paths relative to the repo root
    # (the documented commands run from there) when the output lives inside
    # the repo, else absolute
    try:
        pre_path = str((out / "preprocessed").relative_to(
            pathlib.Path(__file__).resolve().parents[1]))
    except ValueError:
        pre_path = str(out / "preprocessed")
    demo_cfg["path"] = {
        "corpus": "", "formatted": "",
        "preprocessed": pre_path,
        "font": "",
        "ckpt": "/tmp/vow_demo/ckpt", "log": "/tmp/vow_demo/log",
        "result": "/tmp/vow_demo/result",
    }
    (out / "config.json").write_text(json.dumps(demo_cfg, indent=1))

    if args.alt_voc_steps > 0:
        for spec in alt_specs:
            print(f"== train alt vocoder ({spec['family']}) ==", flush=True)
            train_alt_vocoder(work, out, spec, steps=args.alt_voc_steps)

    # smoke-test through the standalone serving entry + write a sample
    from visual_onoma_to_wave_tpu.cli import load_config
    from visual_onoma_to_wave_tpu.data.audio_io import write_wav
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    if args.alt_voc_steps > 0:
        _smoke_alt(out, alt_specs)
    synth = Synthesizer.from_checkpoint(
        load_config(str(out / "config.json")),
        acoustic=str(out / "acoustic"), vocoder=str(out / "vocoder"))
    res = synth.synthesize("パンパン", CLASSES[0])
    if res.wav is None:
        # only an undertrained (smoke-run) model predicts 0 frames
        print(f"demo artifacts in {out} (model predicts 0 frames — "
              f"undertrained smoke build, no sample.wav)")
        return 0
    assert np.isfinite(res.wav).all()
    write_wav(out / "sample.wav", res.wav,
              synth.config.audio.sampling_rate)
    print(f"demo artifacts in {out} (sample: {res.mel_len} mel frames, "
          f"{res.wav.shape[0] / synth.config.audio.sampling_rate:.2f}s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
