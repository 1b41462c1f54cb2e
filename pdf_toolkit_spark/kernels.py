"""Pure NumPy image heuristics (no Spark, no PIL).

These reproduce, decision-for-decision, the reference's Pillow-based
page-image heuristics (/root/reference/src/pdf-toolkit/page_images.py):

- detect_spread             (page_images.py:118-123)
- detect_gutter_x           (page_images.py:126-172) — darkest-column
                            argmin over a strided center window
- split_spread_image        (page_images.py:175-202)
- find_crop_bbox            (page_images.py:320-407) — bright-region
                            bbox with pad, inset, outer clamp, and four
                            fallback-to-full-image paths
- detect_outer_black_bar_px (page_images.py:205-261) — stateful
                            release-run scan over edge columns
- resolve_outer_clamp_px    (page_images.py:264-317)
- apply_split_symmetry      (page_images.py:467-543)

Every clamp, truncation (int() floors), tie-break (first minimum wins)
and fallback note string is preserved because the pipeline's
correctness gate is span-sequence equality. The implementation is
vectorized NumPy (the reference uses per-pixel Python loops); the only
remaining Python loop is the tiny stateful release-run scan, bounded by
width/2 iterations per page.

Images are ``uint8`` arrays: 2-D ``(h, w)`` grayscale or 3-D
``(h, w, 3)`` RGB. Bboxes are ``(left, top, right, bottom)`` with
right/bottom exclusive (PIL convention).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .errors import UserError

BBox = tuple[int, int, int, int]

#: Fallback notes, verbatim (page_images.py:349,355,363,373,405) — they
#: flow into lineage rows and must be stable strings.
NOTE_NO_BRIGHT = "No bright page region found; used full image."
NOTE_TOO_SMALL = "Detected page area too small; used full image."
NOTE_BAD_PAD = "Invalid crop bounds after padding; used full image."
NOTE_BAD_INSET = "Invalid crop bounds after edge inset; used full image."
NOTE_BAD_CLAMP = "Invalid crop bounds after outer margin clamp; used full image."


def to_gray(image: np.ndarray) -> np.ndarray:
    """Grayscale view of an image array.

    RGB -> L uses Pillow's ITU-R 601-2 integer rounding
    ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16`` so values match a
    PIL ``convert("L")`` bit-for-bit (gray triplets round-trip exactly).
    """

    if image.ndim == 2:
        return image
    if image.ndim == 3 and image.shape[2] == 3:
        r = image[:, :, 0].astype(np.uint32)
        g = image[:, :, 1].astype(np.uint32)
        b = image[:, :, 2].astype(np.uint32)
        return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(np.uint8)
    raise UserError(f"Unsupported image shape {image.shape}; need (h,w) or (h,w,3).")


def detect_spread(width: int, height: int, split_ratio: float) -> bool:
    """True when aspect ratio suggests two facing pages (pi.py:118-123)."""

    if height <= 0:
        return False
    return (width / height) >= split_ratio


def detect_gutter_x(
    gray: np.ndarray,
    gutter_search_frac: float,
    x_step: int,
    y_step: int,
) -> tuple[int, bool]:
    """Darkest-column scan near the center; returns (gutter_x, fell_back).

    Column score = sum of pixels at row stride ``y_step``; candidates
    are columns at stride ``x_step`` within the center window of width
    ``gutter_search_frac * width``; first minimum wins. A winner outside
    the central 20%-80% band falls back to the exact center
    (page_images.py:126-172).
    """

    gray = to_gray(gray)
    height, width = gray.shape
    center_x = width // 2
    half_window = max(1, int((gutter_search_frac * width) / 2))
    start_x = max(0, center_x - half_window)
    end_x = min(width - 1, center_x + half_window)

    # Strided, vectorized equivalent of the reference's nested pixel loop.
    window = gray[::y_step, start_x : end_x + 1 : x_step].astype(np.int64)
    scores = window.sum(axis=0)
    best_x = start_x + x_step * int(np.argmin(scores))  # first min wins

    fallback_to_center = False
    if not (int(0.2 * width) < best_x < int(0.8 * width)):
        best_x = center_x
        fallback_to_center = True

    best_x = max(1, min(width - 1, best_x)) if width >= 2 else 0
    return best_x, fallback_to_center


def split_bounds(width: int, gutter_x: int, gutter_trim_px: int = 0) -> tuple[int, int]:
    """Column bounds for the two halves: left is ``[0, left_end)``,
    right is ``[right_start, width)`` (page_images.py:175-199)."""

    if width < 2:
        raise UserError("Image is too narrow to split into two pages.")
    safe_gx = max(1, min(width - 1, gutter_x))
    trim = max(0, gutter_trim_px)

    left_end = max(1, safe_gx - trim)
    right_start = min(width - 1, safe_gx + trim)
    if right_start < left_end:
        left_end = max(1, min(width - 1, safe_gx))
        right_start = max(left_end + 1, min(width - 1, safe_gx + 1))
        if right_start > width - 1:
            right_start = width - 1
    return left_end, right_start


def split_spread_image(
    image: np.ndarray, gutter_x: int, gutter_trim_px: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Split a spread into (left, right) arrays at the gutter."""

    width = image.shape[1]
    left_end, right_start = split_bounds(width, gutter_x, gutter_trim_px)
    return image[:, :left_end], image[:, right_start:]


def detect_outer_black_bar_px(
    image: np.ndarray,
    *,
    side: str,
    search_frac: float,
    dark_threshold: int,
    dark_frac_cutoff: float,
    release_frac: float,
    min_run_px: int,
    y0_frac: float = 0.0,
    y1_frac: float = 1.0,
) -> int:
    """Width in px of a dark bar at the outer edge, 0 when none
    (page_images.py:205-261).

    Walks edge columns inward; a column is "bar" when the fraction of
    dark pixels (within the [y0_frac, y1_frac) height band) reaches
    ``dark_frac_cutoff``. After a bar, ``min_run_px`` consecutive
    released columns (dark fraction <= release_frac) end it; running out
    of search width while still in the bar returns the full search
    width.
    """

    if side not in {"left", "right"}:
        raise UserError("side must be 'left' or 'right' for outer bar detection.")

    gray = to_gray(image)
    height, width = gray.shape
    if width <= 0 or height <= 0:
        return 0
    y0 = max(0, min(height - 1, int(height * y0_frac)))
    y1 = max(y0 + 1, min(height, int(height * y1_frac)))
    band = gray[y0:y1, :]
    band_height = y1 - y0

    search_width = max(1, min(width, int(width * search_frac)))
    cols = np.arange(search_width) if side == "left" else width - 1 - np.arange(search_width)
    # Vectorized per-column dark fraction; the run-length state machine
    # below is O(search_width) and is the only sequential part.
    dark_frac = (band[:, cols] < dark_threshold).sum(axis=0) / band_height

    saw_bar = False
    consecutive_release = 0
    for idx in range(search_width):
        frac = dark_frac[idx]
        if frac >= dark_frac_cutoff:
            saw_bar = True
            consecutive_release = 0
            continue
        if saw_bar and frac <= release_frac:
            consecutive_release += 1
            if consecutive_release >= min_run_px:
                return max(0, idx - consecutive_release + 1)
        elif saw_bar:
            consecutive_release = 0

    return search_width if saw_bar else 0


def resolve_outer_clamp_px(
    image: np.ndarray,
    *,
    outer_margin_mode: str,
    outer_margin_frac: float,
    outer_margin_auto_max_frac: float,
    outer_margin_auto_search_frac: float,
    outer_margin_auto_y0_frac: float,
    outer_margin_auto_y1_frac: float,
    outer_margin_dark_threshold: int,
    outer_margin_dark_frac_cutoff: float,
    outer_margin_release_frac: float,
    outer_margin_min_run_px: int,
    outer_margin_pad_px: int,
    is_left_page: bool,
    outer_clamp_debug: Optional[dict] = None,
) -> tuple[int, int]:
    """(detected_bar_px, applied_clamp_px) for the outer-margin clamp
    (page_images.py:264-317).

    In auto mode the search fraction is bumped to at least
    ``auto_max_frac`` (so the cap is reachable), bounded to [0.01, 0.5];
    applied = min(detected + pad, width * max_frac).
    """

    width = image.shape[1]
    config_search_frac = float(outer_margin_auto_search_frac)
    if outer_margin_mode == "auto":
        effective_search_frac = max(config_search_frac, float(outer_margin_auto_max_frac))
    else:
        effective_search_frac = config_search_frac
    effective_search_frac = min(0.5, max(effective_search_frac, 0.01))
    search_width_px = max(1, min(width, int(width * effective_search_frac)))
    if outer_clamp_debug is not None:
        outer_clamp_debug["search_frac_config"] = config_search_frac
        outer_clamp_debug["search_frac_effective"] = float(effective_search_frac)
        outer_clamp_debug["search_width_px"] = int(search_width_px)

    if outer_margin_mode == "off":
        return 0, 0
    if outer_margin_mode == "fixed":
        return 0, max(0, int(width * outer_margin_frac))

    detected_bar_px = detect_outer_black_bar_px(
        image,
        side="left" if is_left_page else "right",
        search_frac=effective_search_frac,
        dark_threshold=outer_margin_dark_threshold,
        dark_frac_cutoff=outer_margin_dark_frac_cutoff,
        release_frac=outer_margin_release_frac,
        min_run_px=outer_margin_min_run_px,
        y0_frac=outer_margin_auto_y0_frac,
        y1_frac=outer_margin_auto_y1_frac,
    )
    if detected_bar_px <= 0:
        return 0, 0
    max_clamp_px = max(0, int(width * outer_margin_auto_max_frac))
    applied = min(detected_bar_px + outer_margin_pad_px, max_clamp_px)
    return detected_bar_px, max(0, applied)


def find_crop_bbox(
    image: np.ndarray,
    crop_threshold: int,
    pad_px: int,
    min_area_frac: float,
    edge_inset_px: int = 0,
    outer_margin_mode: str = "off",
    outer_margin_frac: float = 0.0,
    outer_margin_auto_max_frac: float = 0.15,
    outer_margin_auto_search_frac: float = 0.18,
    outer_margin_auto_y0_frac: float = 0.10,
    outer_margin_auto_y1_frac: float = 0.90,
    outer_margin_dark_threshold: int = 80,
    outer_margin_dark_frac_cutoff: float = 0.60,
    outer_margin_release_frac: float = 0.35,
    outer_margin_min_run_px: int = 12,
    outer_margin_pad_px: int = 4,
    is_left_page: bool = True,
    outer_clamp_debug: Optional[dict] = None,
) -> tuple[BBox, bool, Optional[str]]:
    """Bright-region page bbox with safe fallback to the full image
    (page_images.py:320-407). Returns (bbox, used_fallback, note)."""

    gray = to_gray(image)
    height, width = gray.shape
    full_bbox: BBox = (0, 0, width, height)

    mask = gray >= crop_threshold
    row_any = mask.any(axis=1)
    col_any = mask.any(axis=0)
    if not row_any.any():
        return full_bbox, True, NOTE_NO_BRIGHT
    rows = np.flatnonzero(row_any)
    cols = np.flatnonzero(col_any)
    left, top = int(cols[0]), int(rows[0])
    right, bottom = int(cols[-1]) + 1, int(rows[-1]) + 1

    if (right - left) * (bottom - top) < int(min_area_frac * width * height):
        return full_bbox, True, NOTE_TOO_SMALL

    left = max(0, left - pad_px)
    top = max(0, top - pad_px)
    right = min(width, right + pad_px)
    bottom = min(height, bottom + pad_px)
    if right <= left or bottom <= top:
        return full_bbox, True, NOTE_BAD_PAD

    inset = max(0, edge_inset_px)
    if inset > 0:
        left = min(right - 1, left + inset)
        top = min(bottom - 1, top + inset)
        right = max(left + 1, right - inset)
        bottom = max(top + 1, bottom - inset)
    if right <= left or bottom <= top:
        return full_bbox, True, NOTE_BAD_INSET

    detected_bar_px, clamp_px = resolve_outer_clamp_px(
        image,
        outer_margin_mode=outer_margin_mode,
        outer_margin_frac=outer_margin_frac,
        outer_margin_auto_max_frac=outer_margin_auto_max_frac,
        outer_margin_auto_search_frac=outer_margin_auto_search_frac,
        outer_margin_auto_y0_frac=outer_margin_auto_y0_frac,
        outer_margin_auto_y1_frac=outer_margin_auto_y1_frac,
        outer_margin_dark_threshold=outer_margin_dark_threshold,
        outer_margin_dark_frac_cutoff=outer_margin_dark_frac_cutoff,
        outer_margin_release_frac=outer_margin_release_frac,
        outer_margin_min_run_px=outer_margin_min_run_px,
        outer_margin_pad_px=outer_margin_pad_px,
        is_left_page=is_left_page,
        outer_clamp_debug=outer_clamp_debug,
    )
    if outer_clamp_debug is not None:
        outer_clamp_debug["mode"] = outer_margin_mode
        outer_clamp_debug["detected_bar_px"] = int(detected_bar_px)
        outer_clamp_debug["applied_clamp_px"] = int(clamp_px)
        outer_clamp_debug["detect_y0_frac"] = float(outer_margin_auto_y0_frac)
        outer_clamp_debug["detect_y1_frac"] = float(outer_margin_auto_y1_frac)

    if clamp_px > 0:
        if is_left_page:
            left = max(left, clamp_px)
        else:
            right = min(right, width - clamp_px)
    if right <= left or bottom <= top:
        return full_bbox, True, NOTE_BAD_CLAMP

    return (left, top, right, bottom), False, None


def apply_split_symmetry(
    left_bbox: BBox,
    right_bbox: BBox,
    left_image_width: int,
    right_image_width: int,
    gutter_x: int,
    right_offset_x: int,
    strategy: str,
    gutter_trim_px: int = 0,
    left_outer_clamp_px: int = 0,
    right_outer_clamp_px: int = 0,
) -> tuple[BBox, BBox, Optional[str]]:
    """Equalize the two half-page bboxes per strategy
    (page_images.py:467-543). Returns (left, right, fallback_note)."""

    if strategy == "independent":
        return left_bbox, right_bbox, None

    original = (left_bbox, right_bbox)
    left_l, left_t, left_r, left_b = left_bbox
    right_l, right_t, right_r, right_b = right_bbox

    left_min_left = max(0, left_outer_clamp_px)
    left_max_right = left_image_width
    right_min_left = 0
    right_max_right = max(1, right_image_width - max(0, right_outer_clamp_px))

    if strategy == "match_max_width":
        left_width = left_r - left_l
        right_width = right_r - right_l
        max_width = max(left_width, right_width)
        if left_width < max_width:
            left_r = min(left_max_right, left_l + max_width)
        if right_width < max_width:
            right_l = max(right_min_left, right_r - max_width)
    elif strategy == "mirror_from_gutter":
        right_global_left = right_offset_x + right_l
        left_gap = max(0, gutter_x - left_r)
        right_gap = max(0, right_global_left - gutter_x)
        target_gap = max(left_gap, right_gap)
        left_r = min(left_max_right, max(left_l + 1, gutter_x - target_gap))
        mirrored_local_left = (gutter_x + target_gap) - right_offset_x
        right_l = max(right_min_left, min(right_r - 1, mirrored_local_left))
    else:
        return original[0], original[1], "Unknown symmetry strategy; used independent."

    left_l = max(left_l, left_min_left)
    right_r = min(right_r, right_max_right)
    left_r = min(left_r, left_max_right)
    right_l = max(right_l, right_min_left)

    cand_left: BBox = (left_l, left_t, left_r, left_b)
    cand_right: BBox = (right_l, right_t, right_r, right_b)
    if cand_left[2] <= cand_left[0] or cand_right[2] <= cand_right[0]:
        if strategy == "mirror_from_gutter":
            note = "Mirror symmetry could not be satisfied safely; used independent."
        else:
            note = f"Invalid symmetry bounds for strategy={strategy}; used independent."
        return original[0], original[1], note

    return cand_left, cand_right, None


def normalize_rotation(current: int, degrees: int) -> int:
    """New /Rotate value after a clockwise rotation (rotate.py:110-113)."""

    return (current + degrees) % 360


def rotate_image_cw(image: np.ndarray, degrees: int) -> np.ndarray:
    """Rotate a raster clockwise by 0/90/180/270 degrees.

    Matches the reference's PIL ``rotate(-degrees, expand=True)``
    (rotate.py:274-278) for right angles.
    """

    d = degrees % 360
    if d == 0:
        return image
    if d not in {90, 180, 270}:
        raise UserError("Degrees must be one of 90, 180, 270 (clockwise).")
    return np.ascontiguousarray(np.rot90(image, k=-(d // 90)))


def rotate_point_cw(
    row: float, col: float, n_rows: int, n_cols: int, degrees: int
) -> tuple[float, float]:
    """Map a (row, col) point through ``rotate_image_cw`` of a raster of
    shape (n_rows, n_cols). Used to carry text coordinates through
    rotation normalization."""

    d = degrees % 360
    if d == 0:
        return row, col
    if d == 90:  # CW: (r, c) -> (c, n_rows - 1 - r)
        return col, n_rows - 1 - row
    if d == 180:
        return n_rows - 1 - row, n_cols - 1 - col
    if d == 270:
        return n_cols - 1 - col, row
    raise UserError("Degrees must be one of 90, 180, 270 (clockwise).")


def draw_debug_overlay(
    scan: np.ndarray,
    gutter_x: "int | None",
    left_bbox: "BBox | None",
    right_bbox: "BBox | None" = None,
    right_offset_x: int = 0,
) -> np.ndarray:
    """Grayscale analog of the reference's debug overlay
    (page_images.py:546-580): gutter line drawn dark (0), bbox borders
    drawn bright (255); the right bbox is shifted by its offset into
    full-spread coordinates, exactly as the reference shifts it by
    ``gutter_x``. Returns a copy — the scan itself is never mutated."""

    out = np.ascontiguousarray(scan).copy()
    h, w = out.shape

    def _box(bbox: "BBox", shift: int) -> None:
        l, t, r, b = bbox
        l, r = max(0, l + shift), min(w, r + shift)
        t, b = max(0, t), min(h, b)
        if r <= l or b <= t:
            return
        out[t, l:r] = 255
        out[b - 1, l:r] = 255
        out[t:b, l] = 255
        out[t:b, r - 1] = 255

    if gutter_x is not None and 0 <= gutter_x < w:
        out[:, gutter_x] = 0
    if left_bbox is not None:
        _box(left_bbox, 0)
    if right_bbox is not None:
        _box(right_bbox, right_offset_x)
    return out


def resample_nearest(image: np.ndarray, zoom: float) -> np.ndarray:
    """DPI re-render of a raster page: nearest-neighbor resample by
    ``zoom = dpi / 72`` (the reference's fitz.Matrix(zoom, zoom) render,
    reference render.py:105-107, applied to scan-backed pages — this
    engine has no vector rasterizer, so the page raster IS the page).
    Output dims round(h*zoom) x round(w*zoom), min 1; deterministic
    (pixel-center mapping, no interpolation)."""

    if zoom <= 0:
        raise ValueError("zoom must be positive")
    h, w = image.shape[:2]
    oh = max(1, int(np.floor(h * zoom + 0.5)))
    ow = max(1, int(np.floor(w * zoom + 0.5)))
    rows = np.clip(((np.arange(oh) + 0.5) * h / oh).astype(np.int64), 0, h - 1)
    cols = np.clip(((np.arange(ow) + 0.5) * w / ow).astype(np.int64), 0, w - 1)
    return image[rows][:, cols]
