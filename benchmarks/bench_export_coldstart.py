"""Serve cold-start: live checkpoint load vs the AOT export artifact.

Measures time-to-first-audio for the committed demo checkpoints three ways,
each in a FRESH subprocess with an empty persistent compile cache (so
nothing is amortized):

  live        Synthesizer.from_checkpoint + synthesize_batch(1 item)
              (flax model build, orbax restore, jit trace+lower+compile)
  exported    ExportedSynthesizer.load + synthesize_batch(1 item)
              (deserialize the shipped StableHLO; XLA backend-compile only)
  exported+cache  same, second run with the compile cache warm — the
              steady-state restart of a production server

The artifact is built once (not timed) into a temp dir. CPU-forced: the
number is about the host-side pipeline, not the device; on the tunneled
TPU the live path additionally pays per-executable parameter uploads that
the artifact's baked constants also pay, so CPU is the clean comparison.

Usage: python benchmarks/bench_export_coldstart.py
Prints one JSON line per variant.
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parents[1]
DEMO = REPO / "examples/checkpoints/demo"

_CHILD = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
t0 = time.perf_counter()
mode = {mode!r}
if mode == "live":
    from visual_onoma_to_wave_tpu.cli import load_config
    from visual_onoma_to_wave_tpu.synthesis import Synthesizer
    cfg = load_config({demo!r} + "/config.json")
    cfg = cfg.replace(path=cfg.path.__class__(
        corpus="", formatted="", preprocessed={demo!r} + "/preprocessed",
        font="", ckpt={tmp!r} + "/ckpt", log={tmp!r} + "/log",
        result={tmp!r} + "/result"))
    s = Synthesizer.from_checkpoint(
        cfg, acoustic={demo!r} + "/acoustic",
        vocoder={demo!r} + "/vocoder", mesh=None)
else:
    from visual_onoma_to_wave_tpu.export import ExportedSynthesizer
    s = ExportedSynthesizer.load({artifact!r})
load_s = time.perf_counter() - t0
at = next(iter(s.metadata.audiotype_map))
res = s.synthesize_batch(["パン"], [at], return_mel=False)
assert res[0].wav is not None and res[0].wav.shape[0] > 0
total_s = time.perf_counter() - t0
print(json.dumps(dict(load_s=round(load_s, 2),
                      first_audio_s=round(total_s, 2))))
"""


def _run(mode: str, artifact: str, cache_dir: str, tmp: str) -> dict:
    env = dict(os.environ, JAX_COMPILATION_CACHE_DIR=cache_dir)
    code = _CHILD.format(repo=str(REPO), demo=str(DEMO), mode=mode,
                         artifact=artifact, tmp=tmp)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    with tempfile.TemporaryDirectory() as tmp:
        artifact = os.path.join(tmp, "artifact")
        # build the artifact once, untimed (one bucket: the single-request
        # signature a server warms first)
        code = _CHILD.format(repo=str(REPO), demo=str(DEMO), mode="live",
                             artifact=artifact, tmp=tmp)
        build = (
            code.split("load_s = ")[0]
            + f"""
from visual_onoma_to_wave_tpu.export import export_synthesizer
export_synthesizer(s, {artifact!r}, max_batch=1, platforms=("cpu",))
print("built")
""")
        r = subprocess.run([sys.executable, "-c", build],
                           capture_output=True, text=True, timeout=1200)
        if r.returncode != 0:
            raise RuntimeError(r.stderr[-2000:])

        for name, mode, cache in (
                ("live", "live", os.path.join(tmp, "cache_live")),
                ("exported", "exported", os.path.join(tmp, "cache_exp")),
                ("exported_warm_cache", "exported",
                 os.path.join(tmp, "cache_exp"))):
            m = _run(mode, artifact, cache, tmp)
            print(json.dumps({"metric": "serve_cold_start", "variant": name,
                              **m}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
