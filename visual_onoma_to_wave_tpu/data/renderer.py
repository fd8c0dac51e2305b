"""Visual-onomatopoeia rendering: text -> stretched glyph-strip image.

Behavioral parity with reference scripts/preprocessor/visualtext_generator.py:
  * canvas width = ceil(chars_per_sec(class mean) * wav_sec * fontsize) in
    stretching mode, fontsize * len(text) otherwise;
  * per-character widths via fair integer allocation (W + i) // n;
  * each glyph drawn at `fontsize` square then horizontally resized to its
    allocated width and pasted sequentially.

The font is configurable; when the configured TTF is unavailable (the
reference's ipaexg.ttf is a stripped blob) we fall back to PIL's default
bitmap font scaled to the requested size, keeping geometry identical
(canvas/cell widths depend only on the allocation math, not the glyphs).

Glyph-identity fallback: the default bitmap font has NO katakana — every
CJK character renders as the same .notdef tofu box, which would collapse
the paper's central conditioning signal ("glyph identity = timbre cue",
SURVEY/What-the-system-IS). Characters the active font cannot render are
therefore drawn as deterministic per-codepoint stroke patterns: not
typography, but a stable visual signature distinct per character, the
same across runs and hosts, so the visual feature extractor can still
learn character identity with no CJK font installed.
"""
from __future__ import annotations

import pathlib
from functools import lru_cache

import numpy as np
from PIL import Image, ImageDraw, ImageFont


@lru_cache(maxsize=8)
def _load_font(font_path: str, fontsize: int):
    try:
        return ImageFont.truetype(font_path, fontsize)
    except Exception:
        try:
            return ImageFont.load_default(size=fontsize)
        except TypeError:  # older PIL without size kwarg
            return ImageFont.load_default()


def _glyph_mask(font, ch: str, size: int) -> np.ndarray:
    im = Image.new("L", (size, size), 0)
    ImageDraw.Draw(im).text((0, 0), ch, fill=255, font=font)
    return np.asarray(im)


@lru_cache(maxsize=64)
def _font_cmap(font_path: str):
    """Codepoints mapped by a TrueType/OpenType font file, or None when the
    path is not a parseable font (then the bitmap heuristic decides)."""
    try:
        from fontTools.ttLib import TTFont

        tt = TTFont(font_path, fontNumber=0, lazy=True)
        try:
            return frozenset(tt.getBestCmap())
        finally:
            tt.close()
    except Exception:
        return None


@lru_cache(maxsize=4096)
def _has_glyph(font_path: str, fontsize: int, ch: str) -> bool:
    """True when the active font has a real glyph for ch.

    Authoritative check = the font's own character map (some fallback fonts
    populate the Private Use Area, so a bitmap-vs-PUA comparison alone can
    pass tofu boxes through). Only when the configured path is not a
    parseable font file (e.g. PIL's built-in default) fall back to comparing
    against the render of a guaranteed-unmapped private-use codepoint."""
    cmap = _font_cmap(font_path)
    if cmap is not None:
        return ord(ch) in cmap
    font = _load_font(font_path, fontsize)
    return not np.array_equal(_glyph_mask(font, ch, fontsize),
                              _glyph_mask(font, "\ue000", fontsize))


def glyph_source_for_chars(font_path: str, fontsize: int, chars) -> str:
    """How this host renders the given characters: 'font' (every char has a
    real glyph), 'procedural' (none do; all use the deterministic stroke
    patterns) or 'mixed'. Stamped into the preprocessed metadata so serving
    can warn when a model trained on one glyph source is fed the other (the
    two distributions are disjoint)."""
    chars = [c for c in dict.fromkeys(chars) if not c.isspace()]
    if not chars:
        return "font"
    n = sum(_has_glyph(str(font_path), int(fontsize), c) for c in chars)
    return "font" if n == len(chars) else ("procedural" if n == 0 else "mixed")


def _draw_procedural_glyph(draw: "ImageDraw.ImageDraw", ch: str,
                           fontsize: int, fg) -> None:
    """Deterministic per-codepoint stroke pattern for characters the font
    cannot render. Seeded by ord(ch): the same character always gets the
    same strokes, distinct characters get (near-certainly) distinct ones."""
    rng = np.random.default_rng(ord(ch))
    s = fontsize
    pad = max(2, s // 8)
    w = max(1, s // 10)
    pts = rng.integers(pad, max(pad + 1, s - pad), (4, 2))
    for i in range(3):
        draw.line([tuple(pts[i]), tuple(pts[i + 1])], fill=fg, width=w)
    cx, cy = rng.integers(pad, max(pad + 1, s - pad), 2)
    r = int(rng.integers(2, max(3, s // 4)))
    draw.ellipse([cx - r, cy - r, cx + r, cy + r], outline=fg,
                 width=max(1, s // 12))


def _draw_char_cell(bg, fg, font_path: str, fontsize: int, ch: str):
    """fontsize-square RGB cell with ch's glyph (font or procedural)."""
    cell = Image.new("RGB", (fontsize, fontsize), bg)
    d = ImageDraw.Draw(cell)
    if _has_glyph(font_path, fontsize, ch):
        d.text((0, 0), ch, fill=fg, font=_load_font(font_path, fontsize))
    else:
        _draw_procedural_glyph(d, ch, fontsize, fg)
    return cell


def allocate_character_widths(text_len: int, canvas_width: int) -> np.ndarray:
    """Fair integer split of canvas_width into text_len cells
    (reference visualtext_generator.py:19-21)."""
    return np.array(
        [(canvas_width + i) // text_len for i in range(text_len)], dtype=np.int32
    )


class VisualTextRenderer:
    """Renders onomatopoeia text to a width-stretched grayscale/RGB strip."""

    def __init__(
        self,
        font_path: str = "",
        fontsize: int = 24,
        stretching: bool = True,
        background_color: tuple[int, int, int] = (255, 255, 255),
        text_color: tuple[int, int, int] = (0, 0, 0),
        chars_per_sec: float = 4.0,
    ):
        self.font_path = str(font_path)
        self.fontsize = fontsize
        self.stretching = stretching
        self.bg = tuple(background_color)
        self.fg = tuple(text_color)
        self.chars_per_sec = chars_per_sec

    @classmethod
    def from_config(cls, config, chars_per_sec: float = 4.0) -> "VisualTextRenderer":
        vt = config.visual_text
        return cls(
            font_path=config.path.font, fontsize=vt.fontsize,
            stretching=vt.image_stretching,
            background_color=vt.background_color, text_color=vt.text_color,
            chars_per_sec=chars_per_sec,
        )

    def canvas_width(self, text: str, wav_sec: float | None) -> int:
        if self.stretching:
            assert wav_sec is not None, "stretching mode requires wav_sec"
            return int(np.ceil(self.chars_per_sec * wav_sec * self.fontsize))
        return self.fontsize * len(text)

    def draw(
        self,
        text: str,
        wav_sec: float | None = None,
        save_image: str | pathlib.Path | None = None,
        save_width: str | pathlib.Path | None = None,
    ) -> tuple[Image.Image, np.ndarray]:
        width = self.canvas_width(text, wav_sec)
        canvas = Image.new("RGB", (width, self.fontsize), self.bg)
        char_widths = allocate_character_widths(len(text), width)
        x = 0
        for ch, w in zip(text, char_widths):
            cell = _draw_char_cell(self.bg, self.fg, self.font_path,
                                   self.fontsize, ch)
            if self.stretching:
                cell = cell.resize((int(w), self.fontsize))
            canvas.paste(cell, (x, 0))
            x += int(w)
        if save_image is not None:
            # compress_level=1: ~identical size for glyph strips, much
            # cheaper encode (the hot pass-2 cost on a 1-core host)
            canvas.save(save_image, compress_level=1)
        if save_width is not None:
            np.save(save_width, char_widths)
        return canvas, char_widths

    def draw_with_width_rates(
        self, text: str, width_rates: list[float], cell_width: int = 102,
        grayscale: bool = True,
    ) -> np.ndarray:
        """Interactive-demo rendering (reference prediction.ipynb cell 5):
        canvas = len(text) * cell_width px; glyph i is resized to
        fontsize * width_rates[i] wide and centered in its cell.

        Returns a (fontsize, len(text)*cell_width) uint8 array (or RGB)."""
        canvas = Image.new("RGB", (cell_width * len(text), self.fontsize), self.bg)
        for i, (ch, rate) in enumerate(zip(text, width_rates)):
            cell = _draw_char_cell(self.bg, self.fg, self.font_path,
                                   self.fontsize, ch)
            w = max(1, int(round(self.fontsize * rate)))
            cell = cell.resize((w, self.fontsize))
            off = i * cell_width + (cell_width - w) // 2 + (cell_width - w) % 2
            canvas.paste(cell, (off, 0))
        arr = np.asarray(canvas, dtype=np.uint8)
        if grayscale:
            arr = np.asarray(canvas.convert("L"), dtype=np.uint8)
        return arr


def compute_visualtext_info(
    wav_lens: np.ndarray, text_lens: np.ndarray,
    sampling_rate: int = 22050, fontsize: int = 24,
) -> tuple[float, float, float]:
    """Per-class (chars_per_sec_mean, max_char_width, min_char_width)
    (reference preprocessor.py:439-445)."""
    wav_sec = wav_lens / sampling_rate
    cps = float(np.mean(text_lens / wav_sec))
    canvas_w = np.ceil(cps * wav_sec * fontsize).astype(np.int64)
    return (
        cps,
        float(np.max(np.ceil(canvas_w / text_lens))),
        float(np.min(np.ceil(canvas_w / text_lens))),
    )
