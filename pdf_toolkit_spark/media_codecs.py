"""Minimal REAL audio/video container codecs, engine-owned like the
image codecs in pdfio/: PCM WAV (RIFF, 16-bit LE) and YUV4MPEG2
("y4m", the uncompressed interchange format) — both from their public
specifications. They replace the sha256 stub for the audio/video legs
of the multimodal path: the Spark-side ops in ops/multimodal.py
synthesize deterministic payloads, round-trip them through THESE
parsers, and reduce the decoded samples/frames to stats a DuckDB
oracle recomputes arithmetically.

Scope: WAV = canonical RIFF layout, PCM format 1, 16-bit, any
channel count/rate, unknown chunks skipped; y4m = Cmono (Y-plane only)
or C420 frames, integer frame rate. Compressed/float audio and other
colorspaces raise UserError (missing media upstream, never wrong
samples).
"""

from __future__ import annotations

import struct

import numpy as np

from .errors import UserError


def _fail_closed(fmt: str):
    """Decoder boundary for corrupted streams: structural surprises
    (bad ints in headers, short slices, crafted LIST recursion,
    zero-channel division) surface as UserError — missing media
    upstream, never a raw exception out of an Arrow batch."""

    def wrap(fn):
        def inner(payload: bytes):
            try:
                return fn(payload)
            except UserError:
                raise
            except (IndexError, ValueError, KeyError, OverflowError,
                    ZeroDivisionError, struct.error, RecursionError) as ex:
                raise UserError(
                    f"{fmt}: malformed stream ({type(ex).__name__})."
                ) from ex
        inner.__name__ = fn.__name__
        inner.__doc__ = fn.__doc__
        return inner

    return wrap


# ---------------------------------------------------------------------------
# PCM WAV (RIFF)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n,) or (n, channels) int16 -> canonical RIFF/WAVE PCM bytes."""

    if samples.dtype != np.int16:
        raise UserError("WAV encoder: int16 samples required.")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples).tobytes()  # interleaved LE
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_fail_closed("WAV")
def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM bytes -> (rate, (n, channels) int16 array)."""

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise UserError("WAV: not a RIFF/WAVE stream.")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (ln,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise UserError("WAV: missing fmt/data chunk.")
    tag, ch, rate, _br, _ba, bits = fmt
    if tag != 1 or bits != 16:
        raise UserError("WAV: only 16-bit PCM is supported.")
    arr = np.frombuffer(data[: (len(data) // (2 * ch)) * 2 * ch], dtype="<i2")
    return rate, arr.reshape(-1, ch)


# ---------------------------------------------------------------------------
# YUV4MPEG2 (y4m)
# ---------------------------------------------------------------------------

def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n_frames, h, w) uint8 Y planes -> Cmono y4m bytes."""

    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise UserError("y4m encoder: (n, h, w) uint8 frames required.")
    n, h, w = frames.shape
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode())
    for f in range(n):
        out += b"FRAME\n"
        out += np.ascontiguousarray(frames[f]).tobytes()
    return bytes(out)


@_fail_closed("y4m")
def decode_y4m(payload: bytes) -> tuple[int, np.ndarray]:
    """y4m bytes -> (fps, (n_frames, h, w) uint8 Y planes). C420 frames
    decode their Y plane (chroma skipped); other colorspaces raise."""

    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise UserError("y4m: missing stream header.")
    w = h = fps = None
    cs = "C420"
    for tok in payload[10:nl].split(b" "):
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            fps = int(t[1:].split(":")[0])
        elif t.startswith("C"):
            cs = t
    if not w or not h or fps is None:
        raise UserError("y4m: incomplete stream header.")
    if cs == "Cmono":
        frame_len = w * h
    elif cs in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        frame_len = w * h + 2 * ((w // 2) * (h // 2))
    else:
        raise UserError(f"y4m: colorspace {cs} unsupported.")
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise UserError("y4m: bad FRAME marker.")
        pos = fnl + 1
        raw = payload[pos : pos + frame_len]
        if len(raw) < frame_len:
            raise UserError("y4m: truncated frame.")
        frames.append(
            np.frombuffer(raw[: w * h], dtype=np.uint8).reshape(h, w)
        )
        pos += frame_len
    if not frames:
        return fps, np.zeros((0, h, w), np.uint8)
    return fps, np.stack(frames)


# ---------------------------------------------------------------------------
# AVI (RIFF form 'AVI ', classic pre-OpenDML layout) with one
# uncompressed 8-bit grayscale DIB 'vids' stream — the container
# structure is from the public RIFF/AVI documentation: LIST hdrl
# (avih MainAVIHeader + LIST strl (strh AVIStreamHeader + strf
# BITMAPINFOHEADER + palette)), LIST movi ('00db' device-independent
# bitmap chunks, rows bottom-up at 4-byte-aligned stride), idx1.
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, data: bytes) -> bytes:
    """RIFF chunk: fourcc + LE32 size + data + odd-size pad byte."""

    return fourcc + struct.pack("<I", len(data)) + data + (
        b"\x00" if len(data) & 1 else b""
    )


def encode_avi(frames: np.ndarray, fps: int = 25) -> bytes:
    """(n_frames, h, w) uint8 grayscale frames -> AVI bytes (one
    'DIB ' video stream, 8 bpp with a grayscale RGBQUAD palette,
    BI_RGB). DIB convention: rows stored bottom-up, each row padded
    to a 4-byte boundary."""

    if frames.dtype != np.uint8 or frames.ndim != 3:
        raise UserError("avi encoder: (n, h, w) uint8 frames required.")
    n, h, w = frames.shape
    if not (n and h and w and fps > 0):
        raise UserError("avi encoder: empty stream.")
    stride = (w + 3) & ~3
    framesize = stride * h
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        framesize * fps,   # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags: AVIF_HASINDEX
        n, 0, 1,           # dwTotalFrames, dwInitialFrames, dwStreams
        framesize,         # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,  # dwWidth, dwHeight, dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ",
        0, 0, 0, 0,        # dwFlags, wPriority, wLanguage, dwInitialFrames
        1, fps,            # dwScale, dwRate (rate/scale = fps)
        0, n,              # dwStart, dwLength (frames)
        framesize,         # dwSuggestedBufferSize
        0xFFFFFFFF,        # dwQuality (default)
        0,                 # dwSampleSize (0: one sample per chunk)
        0, 0, w, h,        # rcFrame
    )
    bih = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 8,    # biSize, biWidth, biHeight, biPlanes, biBitCount
        0,                 # biCompression = BI_RGB
        framesize, 0, 0,
        256, 0,            # biClrUsed, biClrImportant
    )
    pal = b"".join(bytes((i, i, i, 0)) for i in range(256))
    strl = _chunk(b"LIST", b"strl" + _chunk(b"strh", strh)
                  + _chunk(b"strf", bih + pal))
    hdrl = _chunk(b"LIST", b"hdrl" + _chunk(b"avih", avih) + strl)
    padded = np.zeros((n, h, stride), np.uint8)
    padded[:, :, :w] = frames
    movi_body = b"movi"
    idx = b""
    for i in range(n):
        dib = padded[i, ::-1].tobytes()  # bottom-up rows
        # idx1 offsets are relative to the 'movi' fourcc
        idx += b"00db" + struct.pack("<III", 0x10, len(movi_body), len(dib))
        movi_body += _chunk(b"00db", dib)
    movi = _chunk(b"LIST", movi_body)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


@_fail_closed("avi")
def decode_avi(payload: bytes) -> "tuple[int, np.ndarray]":
    """AVI bytes -> (fps, (n_frames, h, w) uint8 frames). Scope: one
    uncompressed 8-bit DIB 'vids' stream (BI_RGB); compressed
    handlers and other sample formats raise UserError (missing media
    upstream, never wrong pixels). Frames are taken from the movi
    '##db' chunks in stream order; the bottom-up padded-stride DIB
    rows are unflipped back to top-down unpadded planes."""

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise UserError("avi: not a RIFF AVI stream.")
    w = h = nf = None
    fps = None
    bits = comp = None
    frames_raw: "list[bytes]" = []

    def walk(data: bytes) -> None:
        nonlocal w, h, nf, fps, bits, comp
        pos = 0
        while pos + 8 <= len(data):
            fcc = data[pos : pos + 4]
            (sz,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + sz]
            if len(body) < sz:
                raise UserError("avi: truncated chunk.")
            if fcc == b"LIST":
                walk(body[4:])
            elif fcc == b"avih":
                if sz < 40:
                    raise UserError("avi: short avih.")
                vals = struct.unpack("<10I", body[:40])
                nf, w, h = vals[4], vals[8], vals[9]
            elif fcc == b"strh":
                if sz < 48:
                    raise UserError("avi: short strh.")
                if body[:4] == b"vids":
                    scale, rate = struct.unpack("<II", body[20:28])
                    if not scale or rate % scale:
                        raise UserError("avi: non-integer frame rate.")
                    fps = rate // scale
            elif fcc == b"strf" and bits is None:
                if sz < 40:
                    raise UserError("avi: short strf.")
                bits, comp = struct.unpack("<H", body[14:16])[0], \
                    struct.unpack("<I", body[16:20])[0]
            elif fcc[2:4] in (b"db", b"dc"):
                frames_raw.append(body)
            pos += 8 + sz + (sz & 1)

    walk(payload[12:])
    if w is None or fps is None or bits is None:
        raise UserError("avi: missing hdrl headers.")
    if comp != 0 or bits != 8:
        raise UserError("avi: only uncompressed 8-bit DIB frames.")
    stride = (w + 3) & ~3
    frames = []
    for raw in frames_raw:
        if len(raw) < stride * h:
            raise UserError("avi: truncated frame chunk.")
        arr = np.frombuffer(raw[: stride * h], np.uint8).reshape(h, stride)
        frames.append(arr[::-1, :w])
    if nf is not None and nf != len(frames):
        raise UserError("avi: frame count mismatch.")
    if not frames:
        return fps, np.zeros((0, h, w), np.uint8)
    return fps, np.stack(frames)
