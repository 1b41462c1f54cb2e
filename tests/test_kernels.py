"""Kernel parity tests — ported 1:1 from the reference suite
(/root/reference/tests/test_page_images.py), same synthetic geometry,
same pinned expected numbers (e.g. detected=16/applied=20;
search bump 0.18->0.25 with search_width 250; detected=180/applied=150).
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_toolkit_spark import kernels as K
from pdf_toolkit_spark.errors import UserError

from conftest import (
    make_large_outer_bar_page,
    make_outer_bar_page,
    make_partial_height_outer_bar_page,
    make_synthetic_spread,
)


# --- gutter / split (test_page_images.py:101-128) ---


def test_detect_gutter_near_expected_center():
    gutter_x, used_fallback = K.detect_gutter_x(
        make_synthetic_spread(), gutter_search_frac=0.35, x_step=2, y_step=2
    )
    assert not used_fallback
    assert abs(gutter_x - 200) <= 8


def test_split_produces_left_and_right_halves():
    spread = make_synthetic_spread()
    left, right = K.split_spread_image(spread, gutter_x=200)
    assert left.shape[0] == spread.shape[0]
    assert right.shape[0] == spread.shape[0]
    assert left.shape[1] + right.shape[1] == spread.shape[1]


def test_split_with_gutter_trim_reduces_total_width():
    spread = make_synthetic_spread()
    l0, r0 = K.split_spread_image(spread, gutter_x=200, gutter_trim_px=0)
    l1, r1 = K.split_spread_image(spread, gutter_x=200, gutter_trim_px=10)
    assert l0.shape[1] + r0.shape[1] == spread.shape[1]
    assert (l0.shape[1] + r0.shape[1]) - (l1.shape[1] + r1.shape[1]) == 20


def test_split_too_narrow_raises():
    with pytest.raises(UserError):
        K.split_bounds(width=1, gutter_x=0)


# --- crop bbox (test_page_images.py:130-182) ---


def test_crop_bbox_reduces_background():
    left, _ = K.split_spread_image(make_synthetic_spread(), gutter_x=200)
    bbox, used_fallback, note = K.find_crop_bbox(
        left, crop_threshold=180, pad_px=5, min_area_frac=0.25
    )
    assert not used_fallback
    assert note is None
    assert bbox != (0, 0, left.shape[1], left.shape[0])


def test_crop_bbox_edge_inset_shrinks_bbox():
    left, _ = K.split_spread_image(make_synthetic_spread(), gutter_x=200)
    b0, f0, _ = K.find_crop_bbox(left, 180, 5, 0.25, edge_inset_px=0)
    b1, f1, _ = K.find_crop_bbox(left, 180, 5, 0.25, edge_inset_px=5)
    assert not f0 and not f1
    assert b1[0] > b0[0] and b1[1] > b0[1] and b1[2] < b0[2] and b1[3] < b0[3]


def test_outer_margin_frac_clamps_left_boundary():
    left, _ = K.split_spread_image(make_synthetic_spread(), gutter_x=200)
    bbox, used_fallback, _ = K.find_crop_bbox(
        left, 180, 5, 0.25,
        outer_margin_mode="fixed", outer_margin_frac=0.2, is_left_page=True,
    )
    assert not used_fallback
    assert bbox[0] >= int(left.shape[1] * 0.2)


# --- outer bar detection (test_page_images.py:184-206) ---


def test_detect_outer_black_bar_px_detects_bar_and_clean_page():
    kw = dict(side="left", search_frac=0.18, dark_threshold=80,
              dark_frac_cutoff=0.60, release_frac=0.35, min_run_px=4)
    assert K.detect_outer_black_bar_px(make_outer_bar_page("left", 16), **kw) > 0
    assert K.detect_outer_black_bar_px(make_outer_bar_page("left", 0), **kw) == 0


AUTO_KW = dict(
    outer_margin_mode="auto",
    outer_margin_frac=0.0,
    outer_margin_auto_max_frac=0.15,
    outer_margin_auto_search_frac=0.18,
    outer_margin_auto_y0_frac=0.10,
    outer_margin_auto_y1_frac=0.90,
    outer_margin_dark_threshold=80,
    outer_margin_dark_frac_cutoff=0.60,
    outer_margin_release_frac=0.35,
    outer_margin_min_run_px=4,
    outer_margin_pad_px=4,
    is_left_page=True,
)


def test_auto_mode_applies_detected_plus_pad_capped_by_max_frac():
    # cap = 0.15 * 200 = 30; detected 16 + pad 4 = 20 (test:208-226)
    detected, applied = K.resolve_outer_clamp_px(make_outer_bar_page("left", 16), **AUTO_KW)
    assert detected == 16
    assert applied == 20


def test_fixed_mode_clamp_matches_fraction():
    page = make_outer_bar_page("left", 0)
    kw = dict(AUTO_KW, outer_margin_mode="fixed", outer_margin_frac=0.10)
    detected, applied = K.resolve_outer_clamp_px(page, **kw)
    assert detected == 0
    assert applied == int(page.shape[1] * 0.10)


def test_outer_margin_mode_off_matches_baseline_bbox():
    page = make_outer_bar_page("left", 16)
    baseline = K.find_crop_bbox(page, 180, 0, 0.25, edge_inset_px=0)
    off_mode = K.find_crop_bbox(page, 180, 0, 0.25, edge_inset_px=0, outer_margin_mode="off")
    assert baseline == off_mode


def test_auto_mode_does_not_shrink_clean_page():
    clean = make_outer_bar_page("left", 0)
    kw = dict(side="left", search_frac=0.18, dark_threshold=80,
              dark_frac_cutoff=0.60, release_frac=0.35, min_run_px=4)
    assert K.detect_outer_black_bar_px(clean, **kw) == 0
    baseline = K.find_crop_bbox(clean, 180, 0, 0.25, outer_margin_mode="off", is_left_page=True)
    auto = K.find_crop_bbox(
        clean, 180, 0, 0.25,
        outer_margin_mode="auto", outer_margin_auto_max_frac=0.15,
        outer_margin_auto_search_frac=0.18, outer_margin_auto_y0_frac=0.10,
        outer_margin_auto_y1_frac=0.90, outer_margin_dark_threshold=80,
        outer_margin_dark_frac_cutoff=0.60, outer_margin_release_frac=0.35,
        outer_margin_min_run_px=4, outer_margin_pad_px=4, is_left_page=True,
    )
    assert baseline == auto


# --- banded detection (test_page_images.py:310-369) ---


def test_banded_detection_fixes_partial_height_bar_underestimate():
    page = make_partial_height_outer_bar_page("left", 16)
    kw = dict(side="left", search_frac=0.18, dark_threshold=80,
              dark_frac_cutoff=0.70, release_frac=0.35, min_run_px=4)
    no_band = K.detect_outer_black_bar_px(page, y0_frac=0.0, y1_frac=1.0, **kw)
    with_band = K.detect_outer_black_bar_px(page, y0_frac=0.2, y1_frac=0.8, **kw)
    assert no_band < with_band
    assert with_band >= 14


def test_auto_mode_clamp_increases_with_detection_band_on_partial_bar():
    page = make_partial_height_outer_bar_page("left", 16)
    base = dict(AUTO_KW, outer_margin_dark_frac_cutoff=0.70)
    _, applied_no_band = K.resolve_outer_clamp_px(
        page, **dict(base, outer_margin_auto_y0_frac=0.0, outer_margin_auto_y1_frac=1.0)
    )
    _, applied_banded = K.resolve_outer_clamp_px(
        page, **dict(base, outer_margin_auto_y0_frac=0.2, outer_margin_auto_y1_frac=0.8)
    )
    assert applied_banded > applied_no_band


# --- search-frac bump math (test_page_images.py:371-420) ---


def test_auto_mode_max_clamp_reachable_when_max_exceeds_search():
    page = make_large_outer_bar_page(1000, 600, 200)
    debug: dict = {}
    detected, applied = K.resolve_outer_clamp_px(
        page, **dict(AUTO_KW, outer_margin_auto_max_frac=0.25,
                     outer_margin_min_run_px=12, outer_margin_pad_px=0),
        outer_clamp_debug=debug,
    )
    assert detected >= 200
    assert 200 <= applied <= 250
    assert float(debug["search_frac_config"]) == pytest.approx(0.18)
    assert float(debug["search_frac_effective"]) == pytest.approx(0.25)
    assert int(debug["search_width_px"]) == 250


def test_auto_mode_keeps_search_when_max_not_above_search():
    page = make_large_outer_bar_page(1000, 600, 200)
    debug: dict = {}
    detected, applied = K.resolve_outer_clamp_px(
        page, **dict(AUTO_KW, outer_margin_auto_max_frac=0.15,
                     outer_margin_min_run_px=12, outer_margin_pad_px=0),
        outer_clamp_debug=debug,
    )
    assert detected == 180  # search-capped
    assert applied == 150   # 0.15 * 1000
    assert float(debug["search_frac_effective"]) == pytest.approx(0.18)
    assert int(debug["search_width_px"]) == 180


# --- symmetry strategies (test_page_images.py:422-464) ---


def test_symmetry_match_max_width_equalizes_widths():
    left, right, note = K.apply_split_symmetry(
        left_bbox=(20, 10, 150, 190), right_bbox=(20, 10, 170, 190),
        left_image_width=200, right_image_width=200,
        gutter_x=200, right_offset_x=200, strategy="match_max_width",
    )
    assert note is None
    assert left[2] - left[0] == right[2] - right[0]


def test_symmetry_mirror_from_gutter_mirrors_distances():
    left, right, note = K.apply_split_symmetry(
        left_bbox=(20, 10, 180, 190), right_bbox=(30, 10, 180, 190),
        left_image_width=200, right_image_width=200,
        gutter_x=200, right_offset_x=200, strategy="mirror_from_gutter",
    )
    assert note is None
    assert (200 - left[2]) == ((200 + right[0]) - 200)


def test_symmetry_independent_preserves_original_bboxes():
    left_in, right_in = (30, 12, 170, 188), (18, 12, 175, 188)
    left, right, note = K.apply_split_symmetry(
        left_bbox=left_in, right_bbox=right_in,
        left_image_width=200, right_image_width=200,
        gutter_x=200, right_offset_x=200, strategy="independent",
    )
    assert note is None
    assert left == left_in and right == right_in


# --- fallback (test_page_images.py:466-476) ---


def test_crop_bbox_fallback_to_full_image_when_empty_or_tiny():
    dark = np.full((100, 200), 10, dtype=np.uint8)
    bbox, used_fallback, note = K.find_crop_bbox(dark, 180, 5, 0.25)
    assert bbox == (0, 0, 200, 100)
    assert used_fallback
    assert note == K.NOTE_NO_BRIGHT


# --- rotation helpers (rotate.py:110-113, 274-278) ---


def test_normalize_rotation_wraps_mod_360():
    assert K.normalize_rotation(270, 180) == 90
    assert K.normalize_rotation(0, 90) == 90


def test_rotate_image_cw_and_point_agree():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, size=(5, 7), dtype=np.uint8).astype(np.uint8)
    for deg in (90, 180, 270):
        rot = K.rotate_image_cw(img, deg)
        for r, c in [(0, 0), (0, 6), (4, 0), (2, 3), (4, 6)]:
            rr, rc = K.rotate_point_cw(r, c, img.shape[0], img.shape[1], deg)
            assert rot[int(rr), int(rc)] == img[r, c]
    # CW 90 of shape (5,7) is (7,5)
    assert K.rotate_image_cw(img, 90).shape == (7, 5)


def test_rgb_to_gray_matches_pil_for_gray_triplets():
    vals = np.arange(256, dtype=np.uint8)
    rgb = np.stack([vals, vals, vals], axis=-1).reshape(16, 16, 3)
    assert np.array_equal(K.to_gray(rgb), vals.reshape(16, 16))
