"""Shared test fixtures.

Synthetic images mirror the reference's in-memory test fixtures
(/root/reference/tests/test_page_images.py:42-89) with the exact same
geometry and gray values, built with NumPy instead of PIL.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def make_synthetic_spread() -> np.ndarray:
    """400x200 spread: bg 20, bright pages 245, dark gutter band 5 at
    x in [195, 205] (test_page_images.py:42-50). PIL draw.rectangle is
    inclusive of its right/bottom corner — replicated here."""

    img = np.full((200, 400), 20, dtype=np.uint8)
    img[15:186, 20:176] = 245   # left page  (20,15,175,185) inclusive
    img[15:186, 225:381] = 245  # right page (225,15,380,185) inclusive
    img[0:200, 195:206] = 5     # gutter     (195,0,205,199) inclusive
    return img


def make_outer_bar_page(side: str = "left", bar_px: int = 16) -> np.ndarray:
    """200x120 bright page (245) with a dark (5) outer bar
    (test_page_images.py:53-63)."""

    img = np.full((120, 200), 245, dtype=np.uint8)
    if bar_px > 0:
        if side == "left":
            img[:, :bar_px] = 5
        else:
            img[:, 200 - bar_px :] = 5
    return img


def make_partial_height_outer_bar_page(side: str = "left", bar_px: int = 16) -> np.ndarray:
    """Outer bar only within the middle 20%-80% height band
    (test_page_images.py:66-80)."""

    width, height = 200, 120
    y0, y1 = int(height * 0.2), int(height * 0.8)
    img = np.full((height, width), 245, dtype=np.uint8)
    if bar_px > 0:
        if side == "left":
            img[y0:y1, :bar_px] = 5
        else:
            img[y0:y1, width - bar_px :] = 5
    return img


def make_large_outer_bar_page(width: int = 1000, height: int = 600, bar_px: int = 200) -> np.ndarray:
    """Large white page (255) with a solid black (0) left bar
    (test_page_images.py:83-89)."""

    img = np.full((height, width), 255, dtype=np.uint8)
    img[:, :bar_px] = 0
    return img


@pytest.fixture(scope="session")
def spark():
    """Session-wide local SparkSession (local[*], AQE on)."""

    from pdf_toolkit_spark.spark.session import get_spark

    s = get_spark(app_name="pdf-toolkit-spark-tests")
    yield s
    s.stop()
