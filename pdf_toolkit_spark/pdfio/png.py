"""Minimal 8-bit grayscale PNG codec (stdlib zlib + struct only).

The container ships no imaging libraries, so the media sink encodes
extracted page regions itself. This is the engine-owned analog of the
reference's ``pixmap.save(path)`` / ``Image.save(path)`` PNG sinks
(reference render.py:140-142, page_images.py:934-938) — standard PNG
output any external tool can open, produced without PIL.

Encoder: color type 0 (grayscale), bit depth 8, filter type 0 rows,
one IDAT chunk. Decoder: accepts any of the five standard scanline
filters (0-4) so externally-produced grayscale PNGs round-trip too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray_png(arr: np.ndarray, *, level: int = 1) -> bytes:
    """Encode a (h, w) uint8 array as a grayscale PNG.

    zlib level 1 by default: media encoding sits on the extraction hot
    path, and content-addressed blobs are deduplicated downstream, so
    speed beats ratio here.
    """

    if arr.ndim != 2 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w) uint8 array, got {arr.shape} {arr.dtype}")
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # depth 8, gray
    # filter byte 0 prepended to every row
    raster = np.empty((h, w + 1), dtype=np.uint8)
    raster[:, 0] = 0
    raster[:, 1:] = arr
    idat = zlib.compress(raster.tobytes(), level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_gray_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale PNG into a (h, w) uint8 array."""

    if not data.startswith(_SIG):
        raise ValueError("not a PNG: bad signature")
    pos = len(_SIG)
    width = height = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} interlace={interlace}); "
                    "only 8-bit non-interlaced grayscale is supported"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (width + 1):
        raise ValueError("PNG scanline data has wrong length")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, width + 1)
    out = np.zeros((height, width), dtype=np.uint8)
    for y in range(height):
        ftype = rows[y, 0]
        line = rows[y, 1:].astype(np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub
            acc = 0
            row = np.empty(width, dtype=np.uint8)
            for x in range(width):
                acc = (line[x] + acc) & 0xFF
                row[x] = acc
            out[y] = row
        elif ftype == 2:  # Up
            prior = out[y - 1].astype(np.int32) if y else np.zeros(width, dtype=np.int32)
            out[y] = ((line + prior) & 0xFF).astype(np.uint8)
        elif ftype == 3:  # Average
            prior = out[y - 1].astype(np.int32) if y else np.zeros(width, dtype=np.int32)
            row = np.empty(width, dtype=np.uint8)
            left = 0
            for x in range(width):
                left = (line[x] + (left + int(prior[x])) // 2) & 0xFF
                row[x] = left
            out[y] = row
        elif ftype == 4:  # Paeth
            prior = out[y - 1].astype(np.int32) if y else np.zeros(width, dtype=np.int32)
            row = np.empty(width, dtype=np.uint8)
            left = upleft = 0
            for x in range(width):
                left = (line[x] + _paeth(left, int(prior[x]), upleft)) & 0xFF
                row[x] = left
                upleft = int(prior[x])
            out[y] = row
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out
