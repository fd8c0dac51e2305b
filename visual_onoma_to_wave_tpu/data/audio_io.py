"""Native audio IO: RAW/WAV reading, writing, and resampling.

Replaces the reference's pydub (raw 48 kHz/16-bit -> wav, reference
scripts/01_format.py:40-47) and librosa.load(sr=22050) (preprocessor.py:385)
with stdlib + scipy. Resampling uses a polyphase FIR (scipy resample_poly),
numerically very close to librosa's default soxr_hq path; the DSP parity
gates downstream are computed on the resampled signal so framework-internal
consistency is exact.
"""
from __future__ import annotations

import pathlib
import wave
from fractions import Fraction

import numpy as np
from scipy.signal import resample_poly


def read_raw_pcm16(path: str | pathlib.Path, big_endian: bool = False) -> np.ndarray:
    """Read a headerless 16-bit signed mono PCM file -> float32 in [-1, 1).

    RWCP-SSD ships 48 kHz 16-bit mono .raw files (reference README.md:34-42).
    """
    dtype = ">i2" if big_endian else "<i2"
    data = np.fromfile(str(path), dtype=dtype)
    return (data.astype(np.float32) / 32768.0)


def read_wav(path: str | pathlib.Path) -> tuple[np.ndarray, int]:
    """Read a wav -> (float32 mono in [-1, 1], sample_rate).

    PCM via the stdlib; IEEE-float wavs (format tag 3 — what torchaudio/
    soundfile/scipy write by default for float arrays, e.g. the
    reference's own synthesized sample/tmp.wav) via a minimal RIFF parser
    fallback, since stdlib `wave` rejects them."""
    try:
        with wave.open(str(path), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            ch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(n)
    except wave.Error:
        return _read_wav_riff(path)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def _read_wav_riff(path: str | pathlib.Path) -> tuple[np.ndarray, int]:
    """Minimal RIFF/WAVE parser for the formats stdlib `wave` rejects:
    IEEE float (tag 3) and WAVE_FORMAT_EXTENSIBLE (0xFFFE) wrapping
    PCM/float."""
    import struct

    data = pathlib.Path(path).read_bytes()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    tag, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE and len(fmt) >= 26:  # extensible: real tag in GUID
        tag = struct.unpack("<H", fmt[24:26])[0]
    if tag == 3:  # IEEE float
        x = np.frombuffer(payload, "<f4" if bits == 32 else "<f8")
        x = x.astype(np.float32)
    elif tag == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(payload, "<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(payload, "<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(payload, np.uint8).astype(np.float32)
                 - 128.0) / 128.0
        else:
            raise ValueError(f"{path}: unsupported PCM bit depth {bits}")
    else:
        raise ValueError(f"{path}: unsupported wav format tag {tag}")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return x, sr


def wav_bytes(audio: np.ndarray, sample_rate: int) -> bytes:
    """float32 [-1, 1] mono audio -> in-memory 16-bit PCM wav file bytes
    (for the HTTP servers' audio payloads; no temp files). The single
    float->PCM encode shared by every wav writer in the package."""
    import io

    audio = np.clip(np.asarray(audio, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(audio * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def write_wav(path: str | pathlib.Path, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 [-1, 1] mono audio as 16-bit PCM wav."""
    pathlib.Path(path).write_bytes(wav_bytes(audio, sample_rate))


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (e.g. 48000 -> 22050 uses up=147, down=320)."""
    if orig_sr == target_sr:
        return audio.astype(np.float32)
    frac = Fraction(target_sr, orig_sr)
    out = resample_poly(audio.astype(np.float64), frac.numerator, frac.denominator)
    return out.astype(np.float32)


def load_audio(path: str | pathlib.Path, target_sr: int = 22050) -> np.ndarray:
    """librosa.load-equivalent: read wav, mono-ize, resample to target_sr."""
    x, sr = read_wav(path)
    return resample(x, sr, target_sr)


def raw_to_wav(raw_path: str | pathlib.Path, wav_path: str | pathlib.Path,
               sample_rate: int = 48000, big_endian: bool = False) -> None:
    """RWCP-SSD .raw -> .wav conversion (reference 01_format.py:40-47)."""
    x = read_raw_pcm16(raw_path, big_endian=big_endian)
    write_wav(wav_path, x, sample_rate)
