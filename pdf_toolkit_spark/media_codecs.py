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
