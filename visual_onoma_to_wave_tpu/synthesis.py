"""End-user synthesis API: onomatopoeia text -> environmental sound waveform.

Library equivalent of the reference demo notebook flow
(reference prediction.ipynb cells 1-6): render the visual onomatopoeia with
per-character width-rate control, run the acoustic model with predicted
durations, vocode the postnet mel with HiFi-GAN.

    synth = Synthesizer(config, state, metadata, symbol_map, vocoder_params)
    wav = synth.synthesize("パンパン", "drum", width_rates=[1.0, 0.6, 1.0, 0.6])
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from visual_onoma_to_wave_tpu.config import Config, DatasetMetadata
from visual_onoma_to_wave_tpu.data.renderer import VisualTextRenderer
from visual_onoma_to_wave_tpu.data.symbols import encode_text
from visual_onoma_to_wave_tpu.training.train_state import TrainState, make_synth_step


@dataclass
class SynthesisResult:
    wav: Optional[np.ndarray]          # (samples,) or None if no vocoder
    mel: np.ndarray                    # (T, n_mels) postnet mel
    durations: np.ndarray              # (n_chars,) predicted frame counts
    energy: Optional[np.ndarray]       # (n_chars,) predicted (normalized)
    image: Optional[np.ndarray]        # (H, W) rendered visual onomatopoeia


class Synthesizer:
    def __init__(self, config: Config, model, state: TrainState,
                 metadata: DatasetMetadata, symbol_map: dict[str, int],
                 vocoder_params=None, vocoder=None):
        self.config = config
        self.model = model
        self.state = state
        self.metadata = metadata
        self.symbol_map = symbol_map
        self.vocoder_params = vocoder_params
        self.vocoder = vocoder
        self.use_image = config.train.use_image
        self.cell_width = metadata.max_pixelsize
        self.renderer = VisualTextRenderer.from_config(config)
        self._synth_step = make_synth_step(model, self.use_image)
        # pad text to small buckets to bound jit specializations
        self.text_bucket = 4

    def _render_cells(self, text: str, width_rates: Sequence[float]) -> np.ndarray:
        """(n_chars, H, cell_width) float32 cells in [0, 1], one per character,
        each glyph width-scaled and centered (prediction.ipynb cell-5 logic)."""
        strip = self.renderer.draw_with_width_rates(
            text, list(width_rates), cell_width=self.cell_width, grayscale=True)
        H = strip.shape[0]
        n = len(text)
        return (
            strip.reshape(H, n, self.cell_width).transpose(1, 0, 2)
            .astype(np.float32) / 255.0
        )

    def synthesize(
        self,
        text: str,
        audiotype: str | int,
        width_rates: Optional[Sequence[float]] = None,
        e_control: float = 1.0,
        d_control: float = 1.0,
        max_mel_len: Optional[int] = None,
    ) -> SynthesisResult:
        if isinstance(audiotype, str):
            audiotype_id = self.metadata.audiotype_map[audiotype]
        else:
            audiotype_id = int(audiotype)
        n = len(text)
        if width_rates is None:
            width_rates = [1.0] * n
        assert len(width_rates) == n

        C = ((n + self.text_bucket - 1) // self.text_bucket) * self.text_bucket
        texts = np.zeros((1, C), np.int32)
        try:
            texts[0, :n] = encode_text(text, self.symbol_map)
        except KeyError:
            pass  # image path does not need ids; unseen chars allowed
        batch = {
            "audiotypes": jnp.asarray([audiotype_id], jnp.int32),
            "texts": jnp.asarray(texts),
            "src_lens": jnp.asarray([n], jnp.int32),
        }
        image = None
        if self.use_image:
            cells = self._render_cells(text, width_rates)
            padded = np.ones((1, C, cells.shape[1], self.cell_width), np.float32)
            padded[0, :n] = cells
            batch["image_cells"] = jnp.asarray(padded)
            image = (cells.transpose(1, 0, 2).reshape(cells.shape[1], -1) * 255
                     ).astype(np.uint8)

        out = self._synth_step(self.state, batch,
                               e_control=e_control, d_control=d_control)
        mel_len = int(out["mel_lens"][0])
        mel = np.asarray(out["postnet_mel"][0])[:max(mel_len, 1)]
        durations = np.asarray(out["duration_rounded"][0][:n]).astype(np.int32)
        energy = (np.asarray(out["energy_pred"][0][:n])
                  if out["energy_pred"] is not None else None)

        wav = None
        if self.vocoder_params is not None and mel_len > 0:
            from visual_onoma_to_wave_tpu.models.hifigan import vocoder_infer
            wavs, lens = vocoder_infer(self.vocoder_params, jnp.asarray(mel[None]),
                                       gen=self.vocoder)
            wav = np.asarray(wavs[0][: int(lens[0])])
        return SynthesisResult(wav=wav, mel=mel, durations=durations,
                               energy=energy, image=image)
