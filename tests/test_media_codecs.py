"""PCM WAV and YUV4MPEG2 container codecs: round-trips, foreign-layout
tolerance (unknown/padded RIFF chunks, C420 chroma skip), and fail-
closed rejection of unsupported encodings."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_toolkit_spark.errors import UserError
from pdf_toolkit_spark.media_codecs import (
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
)

RNG = np.random.default_rng(5)


def test_wav_mono_roundtrip():
    w = RNG.integers(-32768, 32767, 1000).astype(np.int16)
    rate, arr = decode_wav(encode_wav(w, 22050))
    assert rate == 22050 and arr.shape == (1000, 1)
    assert np.array_equal(arr[:, 0], w)


def test_wav_stereo_roundtrip():
    st = RNG.integers(-32768, 32767, (300, 2)).astype(np.int16)
    rate, arr = decode_wav(encode_wav(st, 8000))
    assert rate == 8000 and np.array_equal(arr, st)


def test_wav_skips_unknown_and_odd_chunks():
    """Foreign WAVs carry LIST/INFO chunks (some odd-length, padded):
    the parser must skip them and still find fmt/data."""

    w = np.arange(-50, 50, dtype=np.int16)
    base = encode_wav(w, 16000)
    # splice an odd-length junk chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    patched = base[:12] + junk + base[12:]
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    rate, arr = decode_wav(patched)
    assert rate == 16000 and np.array_equal(arr[:, 0], w)


def test_wav_rejects_non_pcm_and_garbage():
    w = np.zeros(10, np.int16)
    base = bytearray(encode_wav(w, 8000))
    fmt_at = bytes(base).find(b"fmt ")
    base[fmt_at + 8] = 3  # format tag -> IEEE float
    with pytest.raises(UserError):
        decode_wav(bytes(base))
    with pytest.raises(UserError):
        decode_wav(b"not riff at all")


def test_y4m_mono_roundtrip():
    fr = RNG.integers(0, 256, (5, 12, 16), dtype=np.uint8)
    fps, back = decode_y4m(encode_y4m(fr, fps=30))
    assert fps == 30 and np.array_equal(back, fr)


def test_y4m_c420_decodes_y_plane():
    """A C420 stream (foreign default) decodes its luma; chroma planes
    are skipped without desyncing the frame walk."""

    y0 = RNG.integers(0, 256, (10, 12), dtype=np.uint8)
    y1 = RNG.integers(0, 256, (10, 12), dtype=np.uint8)
    chroma = bytes(2 * (6 * 5))
    payload = b"YUV4MPEG2 W12 H10 F25:1 Ip A1:1 C420\n"
    for y in (y0, y1):
        payload += b"FRAME\n" + y.tobytes() + chroma
    fps, frames = decode_y4m(payload)
    assert fps == 25 and frames.shape == (2, 10, 12)
    assert np.array_equal(frames[0], y0) and np.array_equal(frames[1], y1)


def test_y4m_rejects_bad_streams():
    with pytest.raises(UserError):
        decode_y4m(b"MPEG4??? nope")
    with pytest.raises(UserError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 Cmono\nFRAME\n\x00\x00")  # truncated
    with pytest.raises(UserError):
        decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + bytes(48))
