"""Interactive-style synthesis demo — the library equivalent of the
reference's prediction.ipynb Solara GUI (reference prediction.ipynb cells
1-6): pick an onomatopoeia, a sound class, and per-character width rates;
get a waveform, the rendered visual onomatopoeia, and a mel/energy plot.

Usage:
    python examples/demo.py <config> --ckpt-step 200000 \
        --vocoder <converted_vocoder_dir> \
        --text "ドンドン" --audiotype drum --width-rates 1.0,0.5,1.0,0.5

Width rates reproduce the notebook's per-character sliders: each glyph is
drawn at fontsize*rate width and centered in its fixed cell, so wider
characters synthesize longer (the model reads duration from glyph width).
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--text", default="ドンドン")
    ap.add_argument("--audiotype", default=None,
                    help="sound class name (defaults to the first)")
    ap.add_argument("--width-rates", default=None)
    ap.add_argument("--e-control", type=float, default=1.0)
    ap.add_argument("--d-control", type=float, default=1.0)
    ap.add_argument("--ckpt-step", type=int, default=None)
    ap.add_argument("--vocoder", default=None)
    ap.add_argument("--out-dir", default="demo_out")
    args = ap.parse_args(argv)

    from visual_onoma_to_wave_tpu.cli import load_config
    from visual_onoma_to_wave_tpu.data.audio_io import write_wav
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    from visual_onoma_to_wave_tpu.utils.plotting import plot_mel

    cfg = load_config(args.config)
    # standalone serving entry: metadata + vocabulary + params, no Trainer
    # (mirrors prediction.ipynb cell 2: get_model + get_vocoder only)
    synth = Synthesizer.from_checkpoint(
        cfg, vocoder=args.vocoder, restore_step=args.ckpt_step or -1)

    audiotype = args.audiotype or next(iter(synth.metadata.audiotype_map))
    rates = ([float(x) for x in args.width_rates.split(",")]
             if args.width_rates else None)
    res = synth.synthesize(args.text, audiotype, width_rates=rates,
                           e_control=args.e_control, d_control=args.d_control)

    out = pathlib.Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    stem = f"{args.text}_{audiotype}"
    if res.wav is not None:
        write_wav(out / f"{stem}.wav", np.clip(res.wav, -1, 1),
                  cfg.audio.sampling_rate)
        print(f"wrote {out / f'{stem}.wav'} "
              f"({res.wav.shape[0] / cfg.audio.sampling_rate:.2f} s)")
    else:
        print("no vocoder params given — skipping waveform (mel only)")
    if res.image is not None:
        from PIL import Image
        Image.fromarray(res.image).save(out / f"{stem}.png")
        print(f"wrote {out / f'{stem}.png'} (visual onomatopoeia)")
    fig = plot_mel([(res.mel, f"{args.text} ({audiotype})")])
    fig.savefig(out / f"{stem}_mel.png", dpi=120)
    print(f"wrote {out / f'{stem}_mel.png'}")
    print("durations (frames per char):", res.durations.tolist())


if __name__ == "__main__":
    main()
