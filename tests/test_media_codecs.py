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


# ---------------------------------------------------------------------------
# AVI (RIFF 'AVI ', uncompressed 8-bit DIB frames)
# ---------------------------------------------------------------------------

def test_avi_roundtrip_shapes_and_strides():
    """Round-trip across widths that do and don't need the DIB 4-byte
    row pad, single- and multi-frame, plus the bottom-up row flip."""

    from pdf_toolkit_spark.media_codecs import decode_avi, encode_avi

    for n, h, w in ((5, 9, 13), (1, 4, 4), (7, 17, 31), (3, 8, 1), (2, 2, 64)):
        fr = RNG.integers(0, 256, (n, h, w), dtype=np.uint8)
        fps, out = decode_avi(encode_avi(fr, fps=30))
        assert fps == 30 and out.shape == (n, h, w)
        assert np.array_equal(out, fr), (n, h, w)


def test_avi_container_structure():
    """The emitted container really is classic AVI: RIFF form 'AVI ',
    hdrl with avih/strh/strf, a movi LIST of 00db chunks, and an idx1
    index — so third-party readers see a conventional layout."""

    from pdf_toolkit_spark.media_codecs import encode_avi

    fr = RNG.integers(0, 256, (3, 6, 10), dtype=np.uint8)
    data = encode_avi(fr, fps=12)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    for tag in (b"hdrl", b"avih", b"strh", b"strf", b"movi", b"00db",
                b"idx1", b"vids", b"DIB "):
        assert tag in data, tag
    assert data.count(b"00db") == 3 + 3  # movi chunks + idx1 entries


def test_avi_rejects_unsupported_streams():
    from pdf_toolkit_spark.media_codecs import decode_avi, encode_avi

    with pytest.raises(UserError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")  # not an AVI form
    fr = RNG.integers(0, 256, (2, 4, 4), dtype=np.uint8)
    data = bytearray(encode_avi(fr))
    at = bytes(data).find(b"strf") + 8 + 16  # biCompression field
    data[at:at + 4] = b"MJPG"
    with pytest.raises(UserError, match="uncompressed 8-bit"):
        decode_avi(bytes(data))
    # truncated frame chunk fails closed, never wrong pixels
    data = bytearray(encode_avi(fr))
    at = bytes(data).find(b"00db") + 4
    import struct as _s
    (sz,) = _s.unpack("<I", data[at:at + 4])
    data[at:at + 4] = _s.pack("<I", sz - 4)
    with pytest.raises(UserError):
        decode_avi(bytes(data))


def test_decode_header_dispatches_avi():
    """The multimodal header dispatch recognizes AVI payloads and
    returns real geometry; other RIFF forms still raise."""

    from pdf_toolkit_spark.media_codecs import encode_avi
    from pdf_toolkit_spark.ops.multimodal import decode_header

    fr = RNG.integers(0, 256, (4, 7, 11), dtype=np.uint8)
    meta = decode_header(encode_avi(fr, fps=24))
    assert meta["format"] == "avi"
    assert (meta["width"], meta["height"]) == (11, 7)
    with pytest.raises(NotImplementedError):
        decode_header(b"RIFF\x08\x00\x00\x00ACONdata")
