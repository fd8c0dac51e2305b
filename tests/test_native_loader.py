"""Native data-plane kernels: parity with the numpy reference path, and
prefetcher semantics."""
import numpy as np
import pytest

from visual_onoma_to_wave_tpu import native
from visual_onoma_to_wave_tpu.data.dataset import pad_character_cells
from visual_onoma_to_wave_tpu.data.prefetch import prefetch

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no C compiler available")


@needs_native
def test_pad_cells_u8_matches_numpy():
    rng = np.random.default_rng(0)
    for trial in range(5):
        n = int(rng.integers(1, 9))
        widths = rng.integers(5, 130, n)     # includes over-wide glyphs
        img = rng.integers(0, 256, (24, int(widths.sum()))).astype(np.uint8)
        ref = pad_character_cells(img, widths, 102)
        got = native.pad_cells_u8(img, widths.astype(np.int64), 102)
        np.testing.assert_array_equal(got, ref)


@needs_native
def test_fill_cells_f32_matches_numpy():
    rng = np.random.default_rng(1)
    widths = np.array([30, 102, 7, 130], np.int64)  # 130 > cell: clipped
    img = rng.integers(0, 256, (24, int(widths.sum()))).astype(np.uint8)
    ref = pad_character_cells(img, widths, 102).astype(np.float32) / 255.0
    out = np.empty((4, 24, 102), np.float32)
    native.fill_cells_f32(img, widths, 102, out)
    np.testing.assert_allclose(out, ref, atol=1e-7)


@needs_native
def test_cells_parity_on_width_overrun():
    """Malformed width files whose sum exceeds the image width must place
    the truncated glyph at the SAME column in the C kernel and the numpy
    fallback (advisor finding: left offset from the pre-clip width)."""
    rng = np.random.default_rng(2)
    widths = np.array([40, 60, 50], np.int64)      # sum 150
    img = rng.integers(0, 256, (24, 120)).astype(np.uint8)  # 30 px short
    ref = pad_character_cells(img, widths, 102)
    got = native.pad_cells_u8(img, widths, 102)
    np.testing.assert_array_equal(got, ref)
    ref32 = ref.astype(np.float32) / 255.0
    out = np.empty((3, 24, 102), np.float32)
    native.fill_cells_f32(img, widths, 102, out)
    np.testing.assert_allclose(out, ref32, atol=1e-7)
    # fully-exhausted case: last char starts past the image end
    widths2 = np.array([130, 20], np.int64)
    img2 = rng.integers(0, 256, (24, 110)).astype(np.uint8)
    np.testing.assert_array_equal(
        native.pad_cells_u8(img2, widths2, 102),
        pad_character_cells(img2, widths2, 102))


def test_prefetch_order_and_exception():
    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise ValueError("producer failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError, match="producer failed"):
        list(it)


def test_prefetch_empty():
    assert list(prefetch(iter([]))) == []
