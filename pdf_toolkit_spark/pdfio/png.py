"""Minimal 8-bit grayscale/RGB PNG codec (stdlib zlib + struct only).

The container ships no imaging libraries, so the media sink encodes
extracted page regions itself. This is the engine-owned analog of the
reference's ``pixmap.save(path)`` / ``Image.save(path)`` PNG sinks
(reference render.py:140-142, page_images.py:934-938) — standard PNG
output any external tool can open, produced without PIL. The reference
operates on PIL modes "L" and "RGB" (page_images.py:711-716); this
codec covers the same two.

Encoder: color type 0 (grayscale, (h, w) uint8) or 2 (RGB, (h, w, 3)
uint8), bit depth 8, filter type 0 rows, one IDAT chunk. Decoder:
accepts any of the five standard scanline filters (0-4), reusing the
parser's predictor reconstruction.
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


def encode_png(arr: np.ndarray, *, level: int = 1) -> bytes:
    """Encode a (h, w) or (h, w, 3) uint8 array as a PNG.

    zlib level 1 by default: media encoding sits on the extraction hot
    path, and level 1 already shrinks compressible rasters ~50x while
    cutting downstream Arrow/shuffle byte traffic.
    """

    if arr.dtype != np.uint8 or arr.ndim not in (2, 3) or (
        arr.ndim == 3 and arr.shape[2] != 3
    ):
        raise ValueError(f"expected (h, w) or (h, w, 3) uint8 array, got {arr.shape} {arr.dtype}")
    if arr.ndim == 2:
        h, w = arr.shape
        color_type, row_len = 0, w
        flat = arr
    else:
        h, w, _ = arr.shape
        color_type, row_len = 2, w * 3
        flat = arr.reshape(h, row_len)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 prepended to every row
    raster = np.empty((h, row_len + 1), dtype=np.uint8)
    raster[:, 0] = 0
    raster[:, 1:] = flat
    data = raster.tobytes()
    if level > 0 and len(data) >= 65536:
        # Adaptive store mode: deflate on incompressible rasters (photo
        # noise) costs ~7 ms per media blob for no shrink — half the
        # serial extraction profile. Probe a 16 KiB prefix; if it
        # saves < ~6 % fall back to stored deflate blocks (level 0,
        # memcpy speed). Deterministic: the probe depends only on the
        # pixels, so both the serial oracle and every executor agree.
        if len(zlib.compress(data[:16384], level)) > 16384 - 1024:
            level = 0
    idat = zlib.compress(data, level)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def encode_gray_png(arr: np.ndarray, *, level: int = 1) -> bytes:
    """Encode a (h, w) uint8 array as a grayscale PNG."""

    if arr.ndim != 2:
        raise ValueError(f"expected (h, w) uint8 array, got {arr.shape} {arr.dtype}")
    return encode_png(arr, level=level)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit grayscale or RGB PNG into a (h, w) or (h, w, 3)
    uint8 array (any standard scanline filter)."""

    if not data.startswith(_SIG):
        raise ValueError("not a PNG: bad signature")
    pos = len(_SIG)
    width = height = color = None
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
            if depth != 8 or color not in (0, 2) or interlace != 0:
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} interlace={interlace}); "
                    "only 8-bit non-interlaced grayscale/RGB is supported"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    colors = 1 if color == 0 else 3
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (width * colors + 1):
        raise ValueError("PNG scanline data has wrong length")
    # PNG scanline filters are exactly the PDF PNG predictors — reuse
    # the parser's reconstruction (filter byte per row, bpp-aware).
    from .parser import _unpredict

    flat = _unpredict(
        raw, {"Predictor": 15, "Colors": colors, "BitsPerComponent": 8, "Columns": width}
    )
    out = np.frombuffer(flat, dtype=np.uint8)
    if colors == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, 3)


def decode_gray_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to grayscale shape (h, w); RGB input is
    rejected (callers that accept both use :func:`decode_png`)."""

    arr = decode_png(data)
    if arr.ndim != 2:
        raise ValueError("expected a grayscale PNG, got RGB")
    return arr
