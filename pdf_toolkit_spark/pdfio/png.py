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


#: channels per PNG color type (0 gray, 2 RGB, 3 palette, 4 gray+A, 6 RGBA)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

#: Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _unfilter_samples(
    raw: bytes, w: int, h: int, channels: int, depth: int
) -> np.ndarray:
    """Reverse the per-scanline filters of one (sub)image and unpack to
    (h, w, channels) uint8 samples (16-bit takes the high byte; the
    sub-byte depths 1/2/4 return the RAW sample values, unscaled)."""

    # PNG scanline filters are exactly the PDF PNG predictors — reuse
    # the parser's reconstruction (filter byte per row, bpp-aware).
    from .parser import _unpredict

    scan = (w * channels * depth + 7) // 8
    if len(raw) != h * (scan + 1):
        raise ValueError("PNG scanline data has wrong length")
    flat = _unpredict(
        raw,
        {"Predictor": 15, "Colors": channels,
         "BitsPerComponent": depth, "Columns": w},
    )
    rows = np.frombuffer(flat, dtype=np.uint8).reshape(h, scan)
    if depth == 8:
        return rows.reshape(h, w, channels) if scan == w * channels else (
            rows[:, : w * channels].reshape(h, w, channels)
        )
    if depth == 16:
        return rows.reshape(h, scan // 2, 2)[:, : w * channels, 0].reshape(
            h, w, channels
        )
    # 1/2/4-bit: unpack bit groups, row-padded to whole bytes
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, : w * channels * depth].reshape(h, w * channels, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    vals = (per * weights).sum(axis=2).astype(np.uint8)
    return vals.reshape(h, w, channels)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG into a (h, w) grayscale or (h, w, 3) RGB uint8
    array. Full baseline coverage: color types 0/2/3/4/6, bit depths
    1/2/4/8/16 (16-bit takes the high byte), palette via PLTE, any
    standard scanline filter, and Adam7 interlace. Alpha channels are
    dropped (the scan pipeline consumes opaque rasters — same as
    PIL's ``convert("L"/"RGB")`` the reference relies on).

    Fail-closed boundary: corrupted streams raise ValueError, never a
    raw slice/unpack/zlib exception; header-declared sizes are capped
    before allocation and the inflate is bounded by the raw scanline
    size the header implies (zip-bomb proof)."""

    try:
        return _decode_png_impl(data)
    except ValueError:
        raise
    except (IndexError, KeyError, OverflowError, struct.error,
            zlib.error) as ex:
        raise ValueError(
            f"corrupt PNG stream ({type(ex).__name__})"
        ) from ex


def _decode_png_impl(data: bytes) -> np.ndarray:
    if not data.startswith(_SIG):
        raise ValueError("not a PNG: bad signature")
    pos = len(_SIG)
    width = height = color = depth = interlace = None
    plte = None
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
            if color not in _CHANNELS or interlace not in (0, 1):
                raise ValueError(
                    f"unsupported PNG (depth={depth} color={color} "
                    f"interlace={interlace})"
                )
            if depth not in ((1, 2, 4, 8, 16) if color in (0, 3) else (8, 16)):
                raise ValueError(f"invalid PNG depth {depth} for color {color}")
            if color == 3 and depth == 16:
                raise ValueError("invalid PNG: 16-bit palette")
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    channels = _CHANNELS[color]
    # width/height 0 would zero the size product AND the inflate
    # bound below (zlib treats max_length=0 as unlimited) — the
    # zip-bomb guard must reject them, not pass them through
    if width == 0 or height == 0 or width * height * channels > 1 << 28:
        raise ValueError(f"implausible PNG size {width}x{height}")

    # Bound the inflate by the raw byte count the header implies (each
    # scanline is one filter byte + packed samples; Adam7 sums its
    # seven sub-images) so a corrupted/hostile IDAT can't balloon.
    if interlace == 0:
        expect = height * ((width * channels * depth + 7) // 8 + 1)
    else:
        expect = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw and ph:
                expect += ph * ((pw * channels * depth + 7) // 8 + 1)
    raw = zlib.decompressobj().decompress(bytes(idat), expect)

    if interlace == 0:
        samples = _unfilter_samples(raw, width, height, channels, depth)
    else:  # Adam7: seven independently filtered sub-images
        samples = np.zeros((height, width, channels), dtype=np.uint8)
        off = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw == 0 or ph == 0:
                continue
            scan = (pw * channels * depth + 7) // 8
            size = ph * (scan + 1)
            sub = _unfilter_samples(raw[off : off + size], pw, ph, channels, depth)
            off += size
            samples[y0::ys, x0::xs] = sub

    if color == 3:
        idx = samples[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("PNG palette index out of range")
        return plte[idx]
    if depth in (1, 2, 4):  # scale sub-byte gray to full range
        samples = (
            samples.astype(np.uint16) * 255 // ((1 << depth) - 1)
        ).astype(np.uint8)
    if channels == 1:
        return samples[:, :, 0]
    if channels == 2:  # gray + alpha: drop alpha
        return samples[:, :, 0]
    if channels == 4:  # RGBA: drop alpha
        return np.ascontiguousarray(samples[:, :, :3])
    return samples


def decode_gray_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to grayscale shape (h, w); RGB input is
    rejected (callers that accept both use :func:`decode_png`)."""

    arr = decode_png(data)
    if arr.ndim != 2:
        raise ValueError("expected a grayscale PNG, got RGB")
    return arr
