"""AOT export of the fused serving executable (beyond-reference).

`export_synthesizer` serializes the fused acoustic+vocoder serving step
(`synthesis.make_fused_infer` — the single-dispatch hot path behind
`Synthesizer.synthesize_batch` and the HTTP server) into a self-contained
deployment artifact via `jax.export`:

  out_dir/
    manifest.json            # bucket family, platforms, versions
    config.json              # full Config (renderer/audio/model settings)
    symbols.json             # training vocabulary
    metadata/                # DatasetMetadata files (audiotype/stats/...)
    fused_b{B}_c{C}.jexp     # one serialized Exported per (batch, text) bucket

Model AND vocoder parameters are baked into the StableHLO as constants, so
the artifact needs no checkpoint, no flax module construction and no
acoustic/vocoder model code at load time — `ExportedSynthesizer.load(dir)`
rebuilds a drop-in `Synthesizer` replacement (same `synthesize` /
`synthesize_batch` / `batch_signature` surface, so `serve.BatchingServer`
and `cli serve` take it unchanged) from the artifact alone.  Tracing and
lowering are skipped at load; XLA backend-compiles the shipped StableHLO
(the persistent compile cache absorbs that across restarts).

Why this is the TPU-native shape of "deployment packaging": everything the
serving path computes is one compiled XLA program per static bucket
signature; `jax.export` pins exactly that program to a version-stable,
multi-platform (CPU and TPU by default) artifact.  The reference has no
analog — its serving story is "load the torch checkpoint in a notebook"
(`prediction.ipynb` cell 2); this replaces it with a production artifact.

The reference's e/d controls stay TRACED (B,) inputs of the exported
computation, so any mix of per-item control values shares one artifact
(same no-recompile guarantee as the live path, docs/PERF.md).
"""
from __future__ import annotations

import json
import pathlib
import threading
from typing import Optional, Sequence

import jax
import numpy as np

from visual_onoma_to_wave_tpu.config import (
    Config,
    DatasetMetadata,
    config_from_dict,
)
from visual_onoma_to_wave_tpu.data.renderer import VisualTextRenderer
from visual_onoma_to_wave_tpu.data.symbols import (
    load_symbol_map,
    save_symbol_map,
)
from visual_onoma_to_wave_tpu.synthesis import Synthesizer, make_fused_infer

MANIFEST = "manifest.json"
FORMAT_VERSION = 1
# the output pytree every bucket executable returns, in a fixed order
# (subset of the fused step's dict that synthesize_batch consumes)
_OUT_KEYS = ("postnet_mel", "mel_lens", "duration_rounded", "energy_pred",
             "wav")


def _bucket_name(b: int, c: int) -> str:
    return f"fused_b{b}_c{c}.jexp"


def export_synthesizer(
    synth: Synthesizer,
    out_dir: str | pathlib.Path,
    *,
    max_batch: int = 8,
    text_lens: Optional[Sequence[int]] = None,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> dict:
    """Serialize `synth`'s fused serving step for every (batch, text-len)
    bucket up to `max_batch` x max(text_lens).  Returns the manifest dict.

    Buckets mirror `Synthesizer.batch_signature`: power-of-two batch sizes
    and `text_bucket`-multiple text lengths — the live serving path pads to
    exactly these signatures, so a served request dispatches to a shipped
    executable with no recompilation.  `text_lens` defaults to one and two
    text buckets (covers onomatopoeia up to 2*text_bucket characters).
    """
    if synth.vocoder_params is None:
        raise ValueError(
            "export requires a vocoder (the artifact ships the fused "
            "text->waveform path); pass vocoder=... to from_checkpoint")
    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    tb = synth.text_bucket
    if text_lens is None:
        text_lens = (tb, 2 * tb)
    text_lens = sorted({((int(c) + tb - 1) // tb) * tb for c in text_lens})
    if any(c <= 0 for c in text_lens):
        raise ValueError(f"text_lens must be positive, got {text_lens!r}")
    batches = []
    b = 1
    while b <= max_batch:
        batches.append(b)
        b *= 2
    if not batches:
        raise ValueError(f"max_batch must be >= 1, got {max_batch!r}")

    # params fetched to host once: they become baked constants of the
    # serialized computation (device/sharding-agnostic, like save_params)
    state = jax.device_get(synth.state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    vparams = jax.device_get(synth.vocoder_params)
    gen = synth._vocoder_module()
    from visual_onoma_to_wave_tpu.models.melgan import MelGANGenerator
    fused = make_fused_infer(synth.model, gen, synth.use_image,
                             is_melgan=isinstance(gen, MelGANGenerator))

    def closed(batch, e_control, d_control):
        outd = fused(variables, vparams, batch, e_control=e_control,
                     d_control=d_control)
        return {k: outd[k] for k in _OUT_KEYS}

    h = synth.metadata.image_height
    w = synth.cell_width
    f32, i32 = np.float32, np.int32
    exported_fn = jax.export.export(jax.jit(closed),
                                    platforms=list(platforms))
    buckets = []
    for bsz in batches:
        for c in text_lens:
            batch_avals = {
                "audiotypes": jax.ShapeDtypeStruct((bsz,), i32),
                "texts": jax.ShapeDtypeStruct((bsz, c), i32),
                "src_lens": jax.ShapeDtypeStruct((bsz,), i32),
            }
            if synth.use_image:
                batch_avals["image_cells"] = jax.ShapeDtypeStruct(
                    (bsz, c, h, w), f32)
            exp = exported_fn(batch_avals,
                              jax.ShapeDtypeStruct((bsz,), f32),
                              jax.ShapeDtypeStruct((bsz,), f32))
            (out / _bucket_name(bsz, c)).write_bytes(bytes(exp.serialize()))
            buckets.append([bsz, c])

    synth.config.save(out / "config.json")
    save_symbol_map(out, synth.symbol_map)
    synth.metadata.save(out / "metadata")
    manifest = {
        "format_version": FORMAT_VERSION,
        "buckets": buckets,
        "text_bucket": tb,
        "use_image": synth.use_image,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "sampling_rate": synth.config.audio.sampling_rate,
        "hop_length": synth.config.audio.stft.hop_length,
        "vocoder_model": synth.config.model.vocoder_model,
    }
    with open(out / MANIFEST, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


class ExportedSynthesizer(Synthesizer):
    """`Synthesizer` surface served from an exported artifact: text
    encoding, rendering, bucketing, control validation and result trimming
    are the inherited implementations; the device call dispatches to the
    deserialized per-bucket executable instead of a live jit closure.

    Construct with `ExportedSynthesizer.load(dir)`.  Differences from the
    live class: no checkpoint/preprocessed dir needed, no mesh (the
    artifact is a fixed single-program-per-bucket family — shard across
    replicas by running one server per chip group), and `vocode()` (the
    external-mel path) is not shipped — the artifact is the fused
    text->waveform program only.
    """

    _BAKED = object()  # truthy vocoder_params sentinel: params live in the
    #                    artifact, but synthesize* branch on `is not None`

    def __init__(self, export_dir: str | pathlib.Path):
        d = pathlib.Path(export_dir)
        with open(d / MANIFEST) as f:
            manifest = json.load(f)
        if manifest.get("format_version") != FORMAT_VERSION:
            raise ValueError(
                f"unsupported export format_version "
                f"{manifest.get('format_version')!r} (expected "
                f"{FORMAT_VERSION}; re-export with this library version)")
        with open(d / "config.json") as f:
            config: Config = config_from_dict(json.load(f))
        self.manifest = manifest
        self.config = config
        self.metadata = DatasetMetadata.load(d / "metadata")
        symbol_map = load_symbol_map(d)
        if symbol_map is None:
            raise FileNotFoundError(f"no symbols.json in {d}")
        self.symbol_map = symbol_map
        self.model = None
        self.state = None
        self.vocoder = None
        self.vocoder_params = self._BAKED
        self.mesh = None
        self.use_image = bool(manifest["use_image"])
        self.cell_width = self.metadata.max_pixelsize
        self.renderer = VisualTextRenderer.from_config(config)
        self._check_glyph_source()
        self.text_bucket = int(manifest["text_bucket"])
        self.mel_bucket = 64
        self._init_lock = threading.RLock()
        self._synth_step = None
        self._blobs = {(int(b), int(c)): d / _bucket_name(int(b), int(c))
                       for b, c in manifest["buckets"]}
        for (b, c), p in self._blobs.items():
            if not p.exists():
                raise FileNotFoundError(
                    f"manifest lists bucket ({b}, {c}) but {p.name} is "
                    f"missing from {d}")
        self._exports: dict[tuple[int, int], object] = {}
        self._fused_step = self._dispatch
        from visual_onoma_to_wave_tpu.utils.compile_cache import (
            enable_persistent_cache)
        enable_persistent_cache()

    @classmethod
    def load(cls, export_dir: str | pathlib.Path) -> "ExportedSynthesizer":
        return cls(export_dir)

    # -- internal dispatch --------------------------------------------------

    @property
    def max_batch(self) -> int:
        return max(b for b, _ in self._blobs)

    @property
    def max_text_len(self) -> int:
        """Largest text length any shipped bucket covers. The HTTP edge
        (serve.BatchingServer) enforces this so an over-limit text gets a
        clean 400 instead of reaching the worker and failing its whole
        micro-batch group at _pick_bucket time."""
        return max(c for _, c in self._blobs)

    def _pick_bucket(self, b: int, c: int) -> tuple[int, int]:
        """Smallest exported bucket covering (b, c) items, or a clear error
        naming the artifact's limits."""
        fits = [(bb, cc) for bb, cc in self._blobs if bb >= b and cc >= c]
        if not fits:
            raise ValueError(
                f"request needs bucket ({b}, {c}) but the artifact ships "
                f"max batch {max(bb for bb, _ in self._blobs)} x max text "
                f"len {max(cc for _, cc in self._blobs)} — re-export with "
                f"larger max_batch/text_lens")
        return min(fits, key=lambda t: (t[0] * t[1], t))

    def _get_exported(self, key: tuple[int, int]):
        exp = self._exports.get(key)
        if exp is None:
            with self._init_lock:
                exp = self._exports.get(key)
                if exp is None:
                    exp = jax.export.deserialize(
                        self._blobs[key].read_bytes())
                    self._exports[key] = exp
        return exp

    def _dispatch(self, state, vocoder_params, batch, e_control, d_control):
        """Signature-compatible with the live fused step (state and params
        args are ignored — they are baked into the artifact)."""
        b, c = batch["texts"].shape
        bb, cc = self._pick_bucket(int(b), int(c))
        if (bb, cc) != (b, c):
            # pad up to the shipped bucket (same pad values the live
            # bucketing uses: zero ids, src_len 1, all-ones cells, unit
            # controls); extra rows/cols are ignored by the caller's
            # [:bsz] / [:n] trims
            def _pad(x, rows, cols=None):
                x = np.asarray(x)
                widths = [(0, rows - x.shape[0])] + [
                    (0, 0)] * (x.ndim - 1)
                if cols is not None:
                    widths[1] = (0, cols - x.shape[1])
                return np.pad(x, widths)
            nb = dict(batch)
            nb["audiotypes"] = _pad(batch["audiotypes"], bb)
            nb["texts"] = _pad(batch["texts"], bb, cc)
            nb["src_lens"] = np.maximum(_pad(batch["src_lens"], bb), 1)
            if "image_cells" in batch:
                cells = _pad(batch["image_cells"], bb, cc)
                cells[b:, :] = 1.0
                cells[:, c:] = 1.0
                nb["image_cells"] = cells
            batch = nb
            pad1 = np.ones((bb - b,), np.float32)
            e_control = np.concatenate([np.asarray(e_control), pad1])
            d_control = np.concatenate([np.asarray(d_control), pad1])
        out = self._get_exported((bb, cc)).call(batch, e_control, d_control)
        return out

    # -- unsupported live-only surfaces ------------------------------------

    def vocode(self, mels, mel_lens):
        raise RuntimeError(
            "ExportedSynthesizer serves the fused text->waveform program "
            "only; the external-mel vocode() path needs the live "
            "Synthesizer (load the checkpoint instead)")

    def _vocoder_module(self):
        raise RuntimeError(
            "the exported artifact bakes the vocoder into its executables; "
            "no live vocoder module is available")

    def _get_fused_step(self):
        return self._fused_step
