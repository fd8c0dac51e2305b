"""Command-line interface: the reference's numbered scripts as subcommands.

    python -m visual_onoma_to_wave_tpu.cli format      <config> <audio_dir>
    python -m visual_onoma_to_wave_tpu.cli prepare-tg  <config>
    python -m visual_onoma_to_wave_tpu.cli preprocess  <config>
    python -m visual_onoma_to_wave_tpu.cli train       <config> [--restore-step N] [--max-steps N]
    python -m visual_onoma_to_wave_tpu.cli evaluate    <config> [--restore-step N]
    python -m visual_onoma_to_wave_tpu.cli synthesize  <config> --text ... --audiotype ... [--out out.wav]
    python -m visual_onoma_to_wave_tpu.cli convert-vocoder <torch_ckpt> <out_dir>

<config> is either a single JSON/YAML file of the unified schema or a
directory holding the reference-style preprocess.yaml/model.yaml/train.yaml
triple (reference scripts/01_format.py:112-125, 04_train.py:177-205).
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys


def load_config(path: str):
    from visual_onoma_to_wave_tpu.config import (
        Config, config_from_dict, load_yaml_configs)

    p = pathlib.Path(path)
    if p.is_dir():
        pre = p / "preprocess.yaml"
        mod = p / "model.yaml"
        tra = p / "train.yaml"
        return load_yaml_configs(
            str(pre) if pre.exists() else None,
            str(mod) if mod.exists() else None,
            str(tra) if tra.exists() else None,
        )
    if p.suffix == ".json":
        with open(p) as f:
            return config_from_dict(json.load(f))
    if p.suffix in (".yaml", ".yml"):
        import yaml
        with open(p) as f:
            return config_from_dict(yaml.safe_load(f))
    raise SystemExit(f"unsupported config path {path}")


def cmd_format(args):
    from visual_onoma_to_wave_tpu.data.formatting import format_dataset
    cfg = load_config(args.config)
    counts = format_dataset(
        cfg, args.audio_dir,
        missing_acc="keep" if args.keep_missing_acc else "skip")
    print(json.dumps(counts))


def cmd_prepare_tg(args):
    from visual_onoma_to_wave_tpu.data.labels import prepare_textgrids
    cfg = load_config(args.config)
    stats = prepare_textgrids(cfg.path.formatted,
                              list(cfg.dataset.extract_labels) or None)
    print(json.dumps(stats))


def cmd_preprocess(args):
    from visual_onoma_to_wave_tpu.data.preprocess import Preprocessor
    cfg = load_config(args.config)
    result = Preprocessor(cfg, num_workers=args.num_workers,
                          save_audio=args.save_audio).build()
    print(json.dumps(result))


def _maybe_init_distributed(args):
    """Join a multi-host run before any JAX backend init (shared by the
    train / train-vocoder / evaluate subcommands)."""
    if getattr(args, "distributed", False):
        from visual_onoma_to_wave_tpu.parallel import init_distributed
        init_distributed(coordinator_address=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id,
                         cpu_devices_per_process=args.distributed_cpu_devices)


def _add_distributed_args(s):
    s.add_argument("--distributed", action="store_true",
                   help="join a multi-host run (jax.distributed): on TPU "
                        "pods the topology auto-detects; pair with "
                        "--coordinator/--num-processes/--process-id "
                        "elsewhere. Every host runs this same command; "
                        "ckpt/log paths must be shared storage")
    s.add_argument("--coordinator", default=None,
                   help="host:port of process 0 (omit on TPU pods)")
    s.add_argument("--num-processes", type=int, default=None)
    s.add_argument("--process-id", type=int, default=None)
    s.add_argument("--distributed-cpu-devices", type=int, default=None,
                   help="hermetic dry-run of the multi-host layout on CPU: "
                        "N virtual devices per process, gloo collectives")


def cmd_doctor(args):
    from visual_onoma_to_wave_tpu.data.doctor import (
        check_corpus, check_formatted)
    cfg = load_config(args.config)
    if args.stage == "formatted":
        report = check_formatted(cfg)
    else:
        symbols = None
        if args.ckpt:
            from visual_onoma_to_wave_tpu.data.symbols import load_symbol_map
            symbols = load_symbol_map(args.ckpt)
            if symbols is None:
                raise SystemExit(f"no symbols.json under {args.ckpt}")
        report = check_corpus(cfg, limit=args.limit, symbols=symbols)
    print(json.dumps(report, ensure_ascii=False, indent=2))
    if not report["ok"]:
        raise SystemExit(1)


def cmd_train(args):
    _maybe_init_distributed(args)
    from visual_onoma_to_wave_tpu.training.trainer import Trainer
    cfg = load_config(args.config)
    vocoder_params = None
    if args.vocoder:
        from visual_onoma_to_wave_tpu.utils.checkpoint import load_params
        vocoder_params = load_params(args.vocoder)
    trainer = Trainer(cfg, restore_step=args.restore_step,
                      vocoder_params=vocoder_params,
                      profile_dir=args.profile_dir,
                      loader_workers=args.loader_workers)
    trainer.train(max_steps=args.max_steps)


def cmd_evaluate(args):
    _maybe_init_distributed(args)
    from visual_onoma_to_wave_tpu.training.trainer import Trainer
    cfg = load_config(args.config)
    vocoder_params = None
    if getattr(args, "vocoder", None):
        from visual_onoma_to_wave_tpu.utils.checkpoint import load_params
        vocoder_params = load_params(args.vocoder)
    trainer = Trainer(cfg, restore_step=args.restore_step,
                      vocoder_params=vocoder_params)
    losses = trainer.evaluate(metrics=args.metrics)
    print(json.dumps(losses))


def cmd_synthesize(args):
    from visual_onoma_to_wave_tpu.data.audio_io import write_wav
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    cfg = load_config(args.config)
    # standalone serving: metadata + vocabulary + params only — no Trainer,
    # no train dataset, no train-step compile (works with no train.txt)
    synth = Synthesizer.from_checkpoint(
        cfg, acoustic=getattr(args, "acoustic", None), vocoder=args.vocoder,
        restore_step=args.restore_step)
    rates = ([float(x) for x in args.width_rates.split(",")]
             if args.width_rates else None)
    result = synth.synthesize(args.text, args.audiotype, width_rates=rates,
                              e_control=args.e_control, d_control=args.d_control)
    print(f"mel frames: {result.mel.shape[0]}, durations: {result.durations.tolist()}")
    if result.wav is not None and args.out:
        write_wav(args.out, result.wav, cfg.audio.sampling_rate)
        print(f"wrote {args.out}")


def _read_batch_rows(path):
    """Parse a batch-synthesis input file. Two row formats, auto-detected
    per line:

      * the preprocessed split format `name|audiotype|fontsize|font|text`
        (reference dataset.py:137-152) — so train/val/test.txt files work
        directly;
      * simple TSV `text<TAB>audiotype[<TAB>d_control[<TAB>e_control]]`.

    Returns a list of dicts with name/text/audiotype/d/e."""
    rows = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            if "|" in line:
                parts = line.split("|")
                if len(parts) < 5:
                    raise ValueError(
                        f"{path}:{ln + 1}: split-format rows need 5 "
                        f"|-separated fields, got {len(parts)}")
                name, at, _fontsize, _font, text = parts[:5]
                rows.append({"name": name, "text": text, "audiotype": at,
                             "d": 1.0, "e": 1.0})
            else:
                parts = line.split("\t")
                if len(parts) < 2:
                    raise ValueError(
                        f"{path}:{ln + 1}: TSV rows need at least "
                        f"text<TAB>audiotype")
                rows.append({
                    "name": f"{ln:05d}", "text": parts[0],
                    "audiotype": parts[1],
                    "d": float(parts[2]) if len(parts) > 2 else 1.0,
                    "e": float(parts[3]) if len(parts) > 3 else 1.0,
                })
    return rows


def cmd_synthesize_batch(args):
    """Offline corpus synthesis: every row of the input file -> a wav,
    batched through the fused acoustic+vocoder executable.

    Rebuilds (live, tested) what the reference left as dead legacy code:
    its batch-synthesis path over the split files
    (reference utils/tools.py:306-407 synth_samples, old config schema,
    unreachable from the shipped pipeline)."""
    import time as _time

    import numpy as np

    from visual_onoma_to_wave_tpu.data.audio_io import write_wav
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    cfg = load_config(args.config)
    synth = Synthesizer.from_checkpoint(
        cfg, acoustic=args.acoustic, vocoder=args.vocoder,
        restore_step=args.restore_step)
    rows = _read_batch_rows(args.input)
    if not rows:
        print("no rows in input")
        return 1
    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    # group same-length texts together: batch+text-length bucketing means
    # sorted chunks share executables and waste less padding
    order = sorted(range(len(rows)), key=lambda i: len(rows[i]["text"]))
    sr = cfg.audio.sampling_rate
    written, skipped, audio_sec = 0, 0, 0.0
    t0 = _time.perf_counter()
    for c0 in range(0, len(order), args.batch_size):
        chunk = [rows[i] for i in order[c0:c0 + args.batch_size]]
        results = synth.synthesize_batch(
            [r["text"] for r in chunk],
            [r["audiotype"] for r in chunk],
            e_control=[r["e"] * args.e_control for r in chunk],
            d_control=[r["d"] * args.d_control for r in chunk],
            return_mel=False)
        for r, res in zip(chunk, results):
            if res.wav is None or res.mel_len == 0:
                skipped += 1
                continue
            name = "".join(ch if ch.isalnum() or ch in "-_." else "_"
                           for ch in r["name"]) or "row"
            write_wav(out_dir / f"{name}.wav", res.wav, sr)
            written += 1
            audio_sec += res.wav.shape[0] / sr
    wall = _time.perf_counter() - t0
    print(f"wrote {written} wavs ({audio_sec:.1f}s audio) to {out_dir} "
          f"in {wall:.1f}s ({audio_sec / max(wall, 1e-9):.1f}x realtime, "
          f"includes first-compile)"
          + (f"; {skipped} rows predicted 0 frames" if skipped else ""))
    return 0


def cmd_demo(args):
    from visual_onoma_to_wave_tpu.demo_server import DemoServer
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    cfg = load_config(args.config)
    synth = Synthesizer.from_checkpoint(
        cfg, acoustic=args.acoustic, vocoder=args.vocoder,
        restore_step=args.restore_step)
    server = DemoServer(synth, host=args.host, port=args.port)
    server.serve_forever()


def cmd_convert_vocoder(args):
    from visual_onoma_to_wave_tpu.utils.checkpoint import save_params
    if args.kind.lower() in ("melgan", "mel-gan"):
        from visual_onoma_to_wave_tpu.models.melgan import load_torch_melgan
        params = load_torch_melgan(args.torch_ckpt)
    else:
        from visual_onoma_to_wave_tpu.models.hifigan import load_torch_generator
        params = load_torch_generator(args.torch_ckpt)
    save_params(args.out_dir, params)
    print(f"converted {args.kind} generator -> {args.out_dir}")


def cmd_export(args):
    from visual_onoma_to_wave_tpu.export import export_synthesizer
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    # validate cheap args BEFORE the checkpoint load: 'cpu, tpu' must not
    # reach jax.export as ' tpu' and fail opaquely after a slow restore
    platforms = [p.strip().lower() for p in args.platforms.split(",")
                 if p.strip()]
    known = {"cpu", "tpu", "cuda", "rocm"}
    bad = [p for p in platforms if p not in known]
    if bad or not platforms:
        raise SystemExit(f"--platforms: unknown {bad or ['(empty)']}; "
                         f"choose from {sorted(known)}")
    kwargs = {}
    if args.text_lens:
        kwargs["text_lens"] = [int(v) for v in args.text_lens.split(",")]
    cfg = load_config(args.config)
    synth = Synthesizer.from_checkpoint(
        cfg, acoustic=args.acoustic, vocoder=args.vocoder,
        restore_step=args.restore_step, mesh=None)
    manifest = export_synthesizer(
        synth, args.out, max_batch=args.max_batch,
        platforms=platforms, **kwargs)
    print(f"exported {len(manifest['buckets'])} bucket executables "
          f"({','.join(platforms)}) -> {args.out}")


def cmd_serve(args):
    from visual_onoma_to_wave_tpu.serve import BatchingServer
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer

    if args.exported:
        from visual_onoma_to_wave_tpu.export import ExportedSynthesizer
        ignored = [n for n, v in (("config", args.config),
                                  ("--acoustic", args.acoustic),
                                  ("--vocoder", args.vocoder),
                                  ("--restore-step", args.restore_step))
                   if v is not None]
        if ignored:
            print(f"warning: serving the --exported artifact; "
                  f"{', '.join(ignored)} ignored (the artifact bakes its "
                  f"own params/config)")
        synth = ExportedSynthesizer.load(args.exported)
        if synth.max_batch < args.max_batch:
            print(f"note: artifact ships batch buckets up to "
                  f"{synth.max_batch}; capping --max-batch there")
            args.max_batch = synth.max_batch
        from visual_onoma_to_wave_tpu.serve import MAX_TEXT_LEN
        # the server enforces min(its own cap, the artifact's buckets) —
        # print the EFFECTIVE limit, not just the artifact's
        print(f"note: requests capped at "
              f"{min(synth.max_text_len, MAX_TEXT_LEN)} characters "
              f"(artifact text buckets {synth.max_text_len}, server cap "
              f"{MAX_TEXT_LEN})")
    else:
        if not args.config:
            raise SystemExit("serve: config is required (or pass --exported)")
        cfg = load_config(args.config)
        synth = Synthesizer.from_checkpoint(
            cfg, acoustic=args.acoustic, vocoder=args.vocoder,
            restore_step=args.restore_step)
    server = BatchingServer(synth, host=args.host, port=args.port,
                            max_batch=args.max_batch,
                            batch_window_ms=args.window_ms,
                            max_queue=args.max_queue,
                            request_timeout_s=args.request_timeout,
                            pipeline_depth=args.pipeline_depth)
    server.serve_forever()


def cmd_train_vocoder(args):
    _maybe_init_distributed(args)
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        VocoderTrainConfig, VocoderTrainer, load_wav_dir)

    # Family-default recipe (training/vocoder_trainer.family_recipe):
    # the flat HiFi-GAN 2e-4 recipe measurably diverges some families
    # (docs/PERF.md, BASELINE.md). Explicit --lr/--grad-clip always win.
    from visual_onoma_to_wave_tpu.training.vocoder_trainer import (
        family_recipe)
    recipe = family_recipe(args.family)
    lr = args.lr if args.lr is not None else recipe["learning_rate"]
    clip = (args.grad_clip if args.grad_clip is not None
            else recipe["grad_clip_norm"])
    cfg = VocoderTrainConfig(
        segment_size=args.segment_size, batch_size=args.batch_size,
        learning_rate=lr, grad_clip_norm=clip, total_steps=args.steps,
        save_every=args.save_every, seed=args.seed,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        ema_decay=args.ema_decay, on_divergence=args.on_divergence)
    gen = None
    if args.family != "hifigan":
        import jax.numpy as jnp

        from visual_onoma_to_wave_tpu.models.vocoder import get_vocoder
        gen = get_vocoder(args.family, dtype=jnp.dtype(cfg.compute_dtype))
    disc = args.disc or recipe["disc"]
    msd = None
    if disc == "mrd":
        import jax.numpy as jnp

        from visual_onoma_to_wave_tpu.models.hifigan_disc import (
            MultiResolutionDiscriminator)
        msd = MultiResolutionDiscriminator(
            dtype=jnp.dtype(cfg.compute_dtype))
    clips = load_wav_dir(args.wav_dir, target_sr=cfg.sampling_rate)
    print(f"training {args.family} (MPD+{disc.upper()}) on {len(clips)} "
          f"clips "
          f"({sum(len(c) for c in clips) / cfg.sampling_rate:.0f}s of audio)")
    trainer = VocoderTrainer(clips, cfg, gen=gen, ckpt_dir=args.out_dir,
                             log_dir=args.log_dir, msd=msd)
    if args.restore_step is not None:
        step = trainer.restore(args.restore_step if args.restore_step >= 0
                               else None)
        print(f"resumed from step {step}")
    trainer.train()
    print(f"vocoder checkpoints under {args.out_dir} "
          f"(each step dir's generator/ loads via Synthesizer/--vocoder)")


def cmd_convert_acoustic(args):
    from visual_onoma_to_wave_tpu.models.convert_acoustic import (
        load_torch_acoustic,
    )
    from visual_onoma_to_wave_tpu.utils.checkpoint import save_params
    variables = load_torch_acoustic(args.torch_ckpt)
    save_params(args.out_dir, variables)
    print(f"converted vTTS acoustic checkpoint -> {args.out_dir}")


def cmd_bench(args):
    import runpy
    sys.argv = ["bench.py"] + (["--full"] if args.full else []) \
        + (["--f32"] if args.f32 else [])
    runpy.run_path(str(pathlib.Path(__file__).resolve().parents[1] / "bench.py"),
                   run_name="__main__")


def main(argv=None):
    p = argparse.ArgumentParser(prog="visual-onoma-to-wave-tpu")
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu, tpu)")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("format", help="format a raw corpus (01_format)")
    s.add_argument("config")
    s.add_argument("audio_dir")
    s.add_argument("--keep-missing-acc", action="store_true",
                   help="write rows of clips with no .acc file "
                        "(others_score=0) instead of skipping them like "
                        "the reference does for its known-missing case. "
                        "NOTE: preprocess still filters rows below "
                        "acceptance_score_border (default 2.5), so these "
                        "rows only reach the dataset if you also lower "
                        "that border in the config")
    s.set_defaults(fn=cmd_format)

    s = sub.add_parser("prepare-tg", help="lab -> TextGrid (02_prepare_tg)")
    s.add_argument("config")
    s.set_defaults(fn=cmd_prepare_tg)

    s = sub.add_parser("preprocess", help="feature extraction (03_preprocess)")
    s.add_argument("config")
    s.add_argument("--num-workers", type=int, default=None,
                   help="host worker processes (reference --num_workers)")
    s.add_argument("--save-audio", action="store_true",
                   help="also save mel-aligned trimmed waveforms under "
                        "audio/ (vocoder training/fine-tuning pairs)")
    s.set_defaults(fn=cmd_preprocess)

    s = sub.add_parser(
        "doctor",
        help="validate a preprocessed corpus: feature files present, "
             "duration/mel/text/image invariants hold, splits disjoint, "
             "normalization applied (exit 1 on problems)")
    s.add_argument("config")
    s.add_argument("--limit", type=int, default=None,
                   help="check at most N rows per split (default: all)")
    s.add_argument("--ckpt", default=None,
                   help="checkpoint dir: also check every row is encodable "
                        "by ITS saved symbols.json (catches a corpus "
                        "regenerated after training)")
    s.add_argument("--stage", default="preprocessed",
                   choices=["preprocessed", "formatted"],
                   help="formatted = validate the stage-01/02 outputs "
                        "(data.txt rows, TextGrids, wavs) BEFORE "
                        "preprocessing — rows the preprocessor would "
                        "silently skip become visible")
    s.set_defaults(fn=cmd_doctor)

    s = sub.add_parser("train", help="train the acoustic model (04_train)")
    s.add_argument("config")
    s.add_argument("--restore-step", type=int, default=None)
    s.add_argument("--max-steps", type=int, default=None)
    s.add_argument("--vocoder", default=None,
                   help="converted vocoder params dir for synth samples")
    s.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace (steps 10-15) here")
    s.add_argument("--loader-workers", type=int, default=None,
                   help="batch-loader worker processes (default: min(10, "
                        "cpus); <=1 or small hosts load serially behind a "
                        "prefetch thread — reference num_workers=10)")
    _add_distributed_args(s)
    s.set_defaults(fn=cmd_train)

    s = sub.add_parser("evaluate", help="validation losses (evaluate.py)")
    s.add_argument("config")
    s.add_argument("--restore-step", type=int, default=None)
    s.add_argument("--metrics", action="store_true",
                   help="also compute objective quality metrics: "
                        "teacher-forced mel_l1 + MCD, free-running "
                        "DTW-aligned MCD (dB), and — when --vocoder is "
                        "given and the corpus was preprocessed with "
                        "--save-audio — waveform-domain multi-resolution "
                        "STFT distance (mrstft_sc/_mag)")
    s.add_argument("--vocoder", default=None,
                   help="vocoder params dir: enables the waveform-domain "
                        "metrics under --metrics (needs preprocess "
                        "--save-audio waveforms on disk)")
    _add_distributed_args(s)
    s.set_defaults(fn=cmd_evaluate)

    s = sub.add_parser("synthesize", help="text -> wav (prediction.ipynb)")
    s.add_argument("config")
    s.add_argument("--text", required=True)
    s.add_argument("--audiotype", required=True)
    s.add_argument("--width-rates", default=None,
                   help="comma-separated per-char width rates")
    s.add_argument("--e-control", type=float, default=1.0)
    s.add_argument("--d-control", type=float, default=1.0)
    s.add_argument("--restore-step", type=int, default=None)
    s.add_argument("--vocoder", default=None)
    s.add_argument("--acoustic", default=None,
                   help="converted torch acoustic params dir "
                        "(see convert-acoustic)")
    s.add_argument("--out", default="out.wav")
    s.set_defaults(fn=cmd_synthesize)

    s = sub.add_parser(
        "synthesize-batch",
        help="offline corpus synthesis: split-file or TSV rows -> wav dir, "
             "batched through the fused executable")
    s.add_argument("config")
    s.add_argument("input",
                   help="rows: name|audiotype|fontsize|font|text "
                        "(train/val/test.txt work directly) or "
                        "text<TAB>audiotype[<TAB>d_control[<TAB>e_control]]")
    s.add_argument("out_dir")
    s.add_argument("--batch-size", type=int, default=16)
    s.add_argument("--e-control", type=float, default=1.0,
                   help="global multiplier on per-row e_control")
    s.add_argument("--d-control", type=float, default=1.0,
                   help="global multiplier on per-row d_control")
    s.add_argument("--restore-step", type=int, default=None)
    s.add_argument("--vocoder", default=None)
    s.add_argument("--acoustic", default=None)
    s.set_defaults(fn=cmd_synthesize_batch)

    s = sub.add_parser(
        "demo", help="interactive browser demo (prediction.ipynb GUI)")
    s.add_argument("config")
    s.add_argument("--vocoder", default=None,
                   help="converted vocoder params dir (audio playback)")
    s.add_argument("--acoustic", default=None,
                   help="converted torch acoustic params dir")
    s.add_argument("--restore-step", type=int, default=None)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=7860)
    s.set_defaults(fn=cmd_demo)

    s = sub.add_parser(
        "serve", help="production JSON API with TPU micro-batching "
                      "(concurrent requests share one device batch)")
    s.add_argument("config", nargs="?", default=None)
    s.add_argument("--exported", default=None,
                   help="serve from a `cli export` artifact dir instead of "
                        "a checkpoint (self-contained: no model code, no "
                        "preprocessed dir)")
    s.add_argument("--vocoder", default=None,
                   help="converted/trained vocoder params dir")
    s.add_argument("--acoustic", default=None,
                   help="converted torch acoustic params dir")
    s.add_argument("--restore-step", type=int, default=None)
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=7870)
    s.add_argument("--max-batch", type=int, default=32)
    s.add_argument("--window-ms", type=float, default=5.0)
    s.add_argument("--max-queue", type=int, default=1024,
                   help="waiting-request cap; beyond it requests get 503")
    s.add_argument("--request-timeout", type=float, default=30.0,
                   help="per-request deadline in seconds (queued + "
                        "in-flight); past it the client gets 504")
    s.add_argument("--pipeline-depth", type=int, default=2,
                   help="device calls in flight: batch n+1 is collected "
                        "and dispatched while batch n round-trips the "
                        "device (1 = serial)")
    s.set_defaults(fn=cmd_serve)

    s = sub.add_parser(
        "export", help="AOT-export the fused serving step (jax.export) to "
                       "a self-contained deployment artifact")
    s.add_argument("config")
    s.add_argument("--out", required=True, help="artifact output dir")
    s.add_argument("--vocoder", default=None,
                   help="converted/trained vocoder params dir (required "
                        "for the fused path unless baked in the ckpt cfg)")
    s.add_argument("--acoustic", default=None)
    s.add_argument("--restore-step", type=int, default=None)
    s.add_argument("--max-batch", type=int, default=8,
                   help="largest power-of-two batch bucket to ship")
    s.add_argument("--text-lens", default=None,
                   help="comma list of text-length buckets (default: one "
                        "and two text buckets)")
    s.add_argument("--platforms", default="cpu,tpu",
                   help="comma list of jax.export lowering platforms")
    s.set_defaults(fn=cmd_export)

    s = sub.add_parser(
        "train-vocoder",
        help="train a HiFi-GAN vocoder from corpus audio (GAN; "
             "beyond-reference: replaces the downloaded universal ckpt)")
    s.add_argument("wav_dir", help="directory of .wav training clips")
    s.add_argument("out_dir", help="checkpoint output directory")
    s.add_argument("--steps", type=int, default=200_000)
    s.add_argument("--batch-size", type=int, default=16)
    s.add_argument("--segment-size", type=int, default=8192)
    s.add_argument("--lr", type=float, default=None,
                   help="generator/discriminator LR (default: family "
                        "recipe — 2e-4 HiFi-GAN, 1e-4 BigVGAN)")
    s.add_argument("--grad-clip", type=float, default=None,
                   help="global-norm gradient clip, 0 disables (default: "
                        "family recipe — off, 1e3 for BigVGAN)")
    s.add_argument("--save-every", type=int, default=10_000)
    s.add_argument("--seed", type=int, default=0)
    s.add_argument("--log-dir", default=None)
    s.add_argument("--restore-step", type=int, default=None,
                   help="resume from this checkpoint step (-1 = latest)")
    s.add_argument("--family", default="hifigan",
                   choices=["hifigan", "hifigan-v2", "hifigan-v3",
                            "istftnet", "istftnet-mel", "vocos",
                            "bigvgan", "bigvgan-large"],
                   help="generator family: hifigan (V1, reference parity), "
                        "hifigan-v2/-v3 (official smaller presets), "
                        "istftnet (C8C8I; drops the MXU-starved small-"
                        "channel tail), istftnet-mel (mel-rate trunk + "
                        "full iSTFT head), vocos (ConvNeXt trunk at mel "
                        "rate + iSTFT head), bigvgan/-large (snake + "
                        "anti-aliased activations)")
    s.add_argument("--disc", default=None, choices=["msd", "mrd"],
                   help="second discriminator next to the MPD: msd "
                        "(multi-scale, HiFi-GAN recipe) or mrd (multi-"
                        "resolution spectrogram, UnivNet/BigVGAN recipe); "
                        "default: mrd for bigvgan families, msd otherwise")
    s.add_argument("--bf16", action="store_true",
                   help="mixed-precision GAN step (bf16 conv compute, f32 "
                        "params/losses/DSP): ~1.25x faster on v5e")
    s.add_argument("--on-divergence", default="halt",
                   choices=["halt", "warn"],
                   help="GAN-collapse watchdog action (collapse is silent "
                        "and does not self-recover — the measured flat-"
                        "recipe istftnet-mel arm burned ~10k steps of "
                        "frozen output after collapsing, BASELINE.md 20k "
                        "arms): halt (default) = checkpoint the diverged "
                        "state plus a rolling generator_last_healthy "
                        "artifact and stop; warn = print/log once and keep "
                        "training")
    s.add_argument("--ema-decay", type=float, default=0.0,
                   help="exponential-moving-average the generator params "
                        "(0 = off, official recipe; 0.999 for short runs, "
                        "0.9999 for the 200k recipe); saves an extra "
                        "generator_ema/ serving artifact per checkpoint")
    _add_distributed_args(s)
    s.set_defaults(fn=cmd_train_vocoder)

    s = sub.add_parser("convert-acoustic",
                       help="torch vTTS ckpt (200000.pth.tar) -> orbax params")
    s.add_argument("torch_ckpt")
    s.add_argument("out_dir")
    s.set_defaults(fn=cmd_convert_acoustic)

    s = sub.add_parser("convert-vocoder",
                       help="torch vocoder ckpt -> orbax params")
    s.add_argument("torch_ckpt")
    s.add_argument("out_dir")
    s.add_argument("--kind", default="HiFi-GAN",
                   choices=["HiFi-GAN", "MelGAN"],
                   help="vocoder family of the torch checkpoint")
    s.set_defaults(fn=cmd_convert_vocoder)

    s = sub.add_parser("bench", help="run the benchmark harness")
    s.add_argument("--full", action="store_true",
                   help="also report vocoder RTF, acoustic frames/s, "
                        "preprocessing clips/s")
    s.add_argument("--f32", action="store_true",
                   help="strict-parity f32 vocoder instead of bf16")
    s.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    return args.fn(args)


if __name__ == "__main__":
    main()
