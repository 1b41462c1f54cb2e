"""Deterministic 3x5 bitmap microfont + text-page rasterizer.

Closes the render twin's F3 gap (reference render.py rasterizes EVERY
page via fitz/page.get_pixmap; this container has no vector rasterizer
or font files): pages with no embedded scan raster are drawn onto a
white canvas — text items through this original 3x5-per-glyph bitmap
font scaled by the zoom factor, image items pasted through the same
nearest-neighbor resampling the scan path uses. Output is a pure
function of (page geometry, items, zoom), so rendered pixels are
bit-reproducible across runs and cluster sizes.

The glyph art is hand-authored here (uppercase letters, digits, common
punctuation; lowercase maps to uppercase, unknown code points draw a
checker block) — nothing is copied from any font file.
"""

from __future__ import annotations

import numpy as np

_ART: dict[str, tuple[str, ...]] = {
    "A": ("010", "101", "111", "101", "101"),
    "B": ("110", "101", "110", "101", "110"),
    "C": ("011", "100", "100", "100", "011"),
    "D": ("110", "101", "101", "101", "110"),
    "E": ("111", "100", "110", "100", "111"),
    "F": ("111", "100", "110", "100", "100"),
    "G": ("011", "100", "101", "101", "011"),
    "H": ("101", "101", "111", "101", "101"),
    "I": ("111", "010", "010", "010", "111"),
    "J": ("001", "001", "001", "101", "010"),
    "K": ("101", "110", "100", "110", "101"),
    "L": ("100", "100", "100", "100", "111"),
    "M": ("101", "111", "111", "101", "101"),
    "N": ("101", "111", "111", "111", "101"),
    "O": ("010", "101", "101", "101", "010"),
    "P": ("110", "101", "110", "100", "100"),
    "Q": ("010", "101", "101", "110", "011"),
    "R": ("110", "101", "110", "110", "101"),
    "S": ("011", "100", "010", "001", "110"),
    "T": ("111", "010", "010", "010", "010"),
    "U": ("101", "101", "101", "101", "111"),
    "V": ("101", "101", "101", "101", "010"),
    "W": ("101", "101", "111", "111", "101"),
    "X": ("101", "101", "010", "101", "101"),
    "Y": ("101", "101", "010", "010", "010"),
    "Z": ("111", "001", "010", "100", "111"),
    "0": ("111", "101", "101", "101", "111"),
    "1": ("010", "110", "010", "010", "111"),
    "2": ("110", "001", "010", "100", "111"),
    "3": ("110", "001", "010", "001", "110"),
    "4": ("101", "101", "111", "001", "001"),
    "5": ("111", "100", "110", "001", "110"),
    "6": ("011", "100", "110", "101", "010"),
    "7": ("111", "001", "010", "010", "010"),
    "8": ("010", "101", "010", "101", "010"),
    "9": ("010", "101", "011", "001", "110"),
    " ": ("000", "000", "000", "000", "000"),
    ".": ("000", "000", "000", "000", "010"),
    ",": ("000", "000", "000", "010", "100"),
    ":": ("000", "010", "000", "010", "000"),
    ";": ("000", "010", "000", "010", "100"),
    "!": ("010", "010", "010", "000", "010"),
    "?": ("110", "001", "010", "000", "010"),
    "'": ("010", "010", "000", "000", "000"),
    '"': ("101", "101", "000", "000", "000"),
    "(": ("001", "010", "010", "010", "001"),
    ")": ("100", "010", "010", "010", "100"),
    "[": ("011", "010", "010", "010", "011"),
    "]": ("110", "010", "010", "010", "110"),
    "-": ("000", "000", "111", "000", "000"),
    "+": ("000", "010", "111", "010", "000"),
    "=": ("000", "111", "000", "111", "000"),
    "/": ("001", "001", "010", "100", "100"),
    "\\": ("100", "100", "010", "001", "001"),
    "_": ("000", "000", "000", "000", "111"),
    "%": ("101", "001", "010", "100", "101"),
    "#": ("101", "111", "101", "111", "101"),
    "*": ("101", "010", "111", "010", "101"),
    "<": ("001", "010", "100", "010", "001"),
    ">": ("100", "010", "001", "010", "100"),
    "@": ("010", "101", "111", "100", "011"),
    "&": ("010", "101", "010", "101", "011"),
    "$": ("011", "110", "010", "011", "110"),
}

_UNKNOWN = ("101", "010", "101", "010", "101")  # checker block

GLYPH_H, GLYPH_W = 5, 3
_ADVANCE = GLYPH_W + 1  # one blank column between glyphs


def _glyph(ch: str) -> np.ndarray:
    art = _ART.get(ch) or _ART.get(ch.upper()) or _UNKNOWN
    return np.array([[c == "1" for c in row] for row in art], dtype=bool)


_GLYPH_CACHE: dict[str, np.ndarray] = {}


def draw_text(canvas: np.ndarray, text: str, y: int, x: int, scale: int) -> None:
    """Stamp ``text`` in black onto a uint8 gray canvas, glyph top-left
    at (y, x), each glyph pixel scaled to ``scale`` x ``scale``. Glyphs
    falling (partly) outside the canvas are clipped, not errors."""

    H, W = canvas.shape[:2]
    for i, ch in enumerate(text):
        g = _GLYPH_CACHE.get(ch)
        if g is None:
            g = _GLYPH_CACHE[ch] = _glyph(ch)
        gx = x + i * _ADVANCE * scale
        if gx >= W or y >= H:
            continue
        block = np.kron(g, np.ones((scale, scale), dtype=bool))
        y1 = min(H, y + block.shape[0])
        x1 = min(W, gx + block.shape[1])
        if y1 <= max(y, 0) or x1 <= max(gx, 0):
            continue
        sub = block[max(0, -y) : y1 - y, max(0, -gx) : x1 - gx]
        region = canvas[max(y, 0) : y1, max(gx, 0) : x1]
        region[sub] = 0


def rasterize_text_page(
    width: int, height: int, items: list[tuple], zoom: float
) -> np.ndarray:
    """White (h*zoom, w*zoom) canvas with the page's text items drawn
    through the microfont and image items pasted at nearest-neighbor
    zoom — the scan-less-page twin of the scan resample path."""

    from . import kernels as K

    H = max(1, int(round(height * zoom)))
    W = max(1, int(round(width * zoom)))
    canvas = np.full((H, W), 255, np.uint8)
    scale = max(1, int(round(zoom * 3)))
    for item in items:
        kind = item[0]
        if kind == "text":
            _, text, row, col = item[:4]
            draw_text(canvas, str(text), int(round(row * zoom)),
                      int(round(col * zoom)), scale)
        elif kind == "image":
            _, arr, row, col = item[:4]
            if arr.ndim == 3:  # gray analysis canvas: ITU-R 601 luma
                arr = K.to_gray(arr)
            img = K.resample_nearest(arr, zoom)
            y, x = int(round(row * zoom)), int(round(col * zoom))
            y1 = min(H, y + img.shape[0])
            x1 = min(W, x + img.shape[1])
            if y1 > y and x1 > x:
                canvas[max(y, 0) : y1, max(x, 0) : x1] = img[
                    max(0, -y) : y1 - y, max(0, -x) : x1 - x
                ]
    return canvas
