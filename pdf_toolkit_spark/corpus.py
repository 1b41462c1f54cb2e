"""Deterministic synthetic fixture corpus (seed-stable, no external data).

Generates the FIXTURES.md §2 document classes as real PDF byte streams
via ``pdfio.writer``: plain text docs (with repeated headers/footers on
longer docs to exercise boilerplate strip), rotated scans, two-page
spread books (the reference's synthetic-spread geometry,
/root/reference/tests/test_page_images.py:42-50), outer-bar spreads,
mixed text+image pages, all-dark fallback pages, and occasional
mega-PDFs for skew-salting tests.

Every document is a pure function of (seed, doc_id) — byte-identical
across runs, which the resume/idempotence tests rely on.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np

from . import kernels as K
from .config import effective_config
from .pdfio.writer import PageSpec, write_pdf

WORDS = (
    "the quick brown fox jumps over lazy dog page table scan merge sort "
    "filter join window batch stream shuffle partition bucket salt spread "
    "gutter crop margin rotate span text media offset lineage metric"
).split()

DOC_CLASSES = (
    "plain_text",
    "rotated_scan",
    "spread_book",
    "outer_bar",
    "mixed",
    "all_dark",
)


def corpus_config() -> dict[str, Any]:
    """Extraction config used for the fixture corpus: auto outer-clamp
    so the bar-strip path is exercised end-to-end."""

    return effective_config(overrides={"outer_margin_mode": "auto", "pages_per_chunk": 64})


def _sentence(rng: np.random.Generator, n_words: int) -> str:
    return " ".join(WORDS[i] for i in rng.integers(0, len(WORDS), size=n_words))


def _portrait_raster(fill: int = 245, h: int = 200, w: int = 140) -> np.ndarray:
    return np.full((h, w), fill, dtype=np.uint8)


def _spread_raster(bar_px: int = 0) -> np.ndarray:
    """Reference spread geometry scaled: dark bg, two bright pages, dark
    center gutter; optional dark outer bars on both edges."""

    img = np.full((200, 400), 20, dtype=np.uint8)
    img[15:186, 20:176] = 245
    img[15:186, 225:381] = 245
    img[0:200, 195:206] = 5
    if bar_px > 0:
        img[:, :bar_px] = 5
        img[:, 400 - bar_px :] = 5
    return img


def _text_items_for_page(
    rng: np.random.Generator, page_h: int, page_w: int, n: int, col_lo: int, col_hi: int
) -> list[tuple]:
    items = []
    for i in range(n):
        row = 30 + i * max(12, (page_h - 60) // max(1, n))
        col = int(rng.integers(col_lo, max(col_lo + 1, col_hi)))
        items.append(("text", _sentence(rng, int(rng.integers(4, 10))), min(row, page_h - 10), col))
    return items


def _with_header_footer(items: list[tuple], page_no: int, page_h: int, page_w: int) -> list[tuple]:
    header = ("text", "CHAPTER ONE", 5, page_w // 4)
    footer = ("text", str(page_no + 1), page_h - 6, page_w // 2)
    return [header, *items, footer]


def _inverse_rotate_page(upright: PageSpec, rotate: int) -> PageSpec:
    """Store a page so that display-rotation by /Rotate yields the
    upright layout (generator-side inverse of rotation normalization)."""

    if rotate % 360 == 0:
        return upright
    inv = (360 - rotate) % 360
    up_h, up_w = upright.raster.shape
    stored_raster = K.rotate_image_cw(upright.raster, inv)
    stored_items = []
    for item in upright.items:
        kind = item[0]
        row, col = K.rotate_point_cw(item[2], item[3], up_h, up_w, inv)
        if kind == "image":
            stored_items.append((kind, K.rotate_image_cw(item[1], inv), int(row), int(col)))
        else:
            stored_items.append((kind, item[1], int(row), int(col)))
    return PageSpec(raster=stored_raster, rotate=rotate, items=stored_items)


def make_document(doc_id: int, seed: int = 42, mega_every: int = 50) -> dict[str, Any]:
    """Build one document; returns {doc_id, pdf_bytes, n_pages, doc_class}."""

    rng = np.random.default_rng([seed, doc_id])
    if mega_every and doc_id % mega_every == mega_every - 1:
        doc_class = "mega_pdf"
    else:
        doc_class = DOC_CLASSES[doc_id % len(DOC_CLASSES)]

    pages: list[PageSpec] = []
    if doc_class == "plain_text":
        n_pages = int(rng.integers(1, 7))
        for p in range(n_pages):
            raster = _portrait_raster()
            items = _text_items_for_page(rng, 200, 140, int(rng.integers(2, 5)), 10, 120)
            if n_pages >= 4:
                items = _with_header_footer(items, p, 200, 140)
            pages.append(PageSpec(raster=raster, items=items))
    elif doc_class == "rotated_scan":
        n_pages = int(rng.integers(1, 5))
        for p in range(n_pages):
            raster = _portrait_raster()
            items = _text_items_for_page(rng, 200, 140, int(rng.integers(1, 4)), 10, 120)
            upright = PageSpec(raster=raster, items=items)
            rotate = int(rng.choice([90, 180, 270]))
            pages.append(_inverse_rotate_page(upright, rotate))
    elif doc_class == "spread_book":
        n_pages = int(rng.integers(1, 4))
        for _ in range(n_pages):
            raster = _spread_raster()
            left = _text_items_for_page(rng, 200, 400, int(rng.integers(1, 3)), 30, 160)
            right = _text_items_for_page(rng, 200, 400, int(rng.integers(1, 3)), 235, 370)
            pages.append(PageSpec(raster=raster, items=left + right))
    elif doc_class == "outer_bar":
        n_pages = int(rng.integers(1, 3))
        for _ in range(n_pages):
            raster = _spread_raster(bar_px=int(rng.integers(10, 18)))
            items = _text_items_for_page(rng, 200, 400, 2, 40, 360)
            pages.append(PageSpec(raster=raster, items=items))
    elif doc_class == "mixed":
        n_pages = int(rng.integers(1, 4))
        for _ in range(n_pages):
            raster = _portrait_raster()
            embedded = np.full(
                (int(rng.integers(8, 16)), int(rng.integers(8, 16))),
                int(rng.integers(0, 256)),
                dtype=np.uint8,
            )
            items = [
                ("text", _sentence(rng, 6), 30, 12),
                ("image", embedded, 60, 20),
                ("text", _sentence(rng, 5), 120, 12),
            ]
            pages.append(PageSpec(raster=raster, items=items))
    elif doc_class == "all_dark":
        pages.append(PageSpec(raster=np.full((100, 80), 10, dtype=np.uint8),
                              items=[("text", _sentence(rng, 4), 40, 8)]))
    elif doc_class == "mega_pdf":
        n_pages = int(rng.integers(150, 220))
        for p in range(n_pages):
            raster = _portrait_raster(h=100, w=70)
            items = _with_header_footer(
                [("text", _sentence(rng, 5), 40, 6)], p, 100, 70
            )
            pages.append(PageSpec(raster=raster, items=items))
    else:  # pragma: no cover
        raise ValueError(doc_class)

    return {
        "doc_id": f"doc{doc_id:06d}",
        "pdf_bytes": write_pdf(pages),
        "n_pages": len(pages),
        "doc_class": doc_class,
    }


def iter_corpus(n_docs: int, seed: int = 42, mega_every: int = 50) -> Iterator[dict[str, Any]]:
    for doc_id in range(n_docs):
        yield make_document(doc_id, seed=seed, mega_every=mega_every)


def document_from_text(doc_id: int, text: str) -> dict[str, Any]:
    """Deterministically wrap arbitrary text into a fixture PDF (used by
    the driver-contract flagship: testdata documents -> PDFs -> spans).

    Layout varies by doc_id so the whole kernel surface is exercised:
    every 5th doc is a spread page, every 7th is stored rotated.
    """

    words = text.split()
    per_page = 40
    pages: list[PageSpec] = []
    page_no = 0
    for start in range(0, max(len(words), 1), per_page):
        chunk_words = words[start : start + per_page]
        lines = [" ".join(chunk_words[i : i + 8]) for i in range(0, len(chunk_words), 8)]
        if (doc_id + page_no) % 5 == 0:
            raster = _spread_raster()
            items = [
                ("text", line, 30 + 20 * i, 30 if i % 2 == 0 else 240)
                for i, line in enumerate(lines[:7])
            ]
            pages.append(PageSpec(raster=raster, items=items))
        else:
            raster = _portrait_raster()
            items = [("text", line, 20 + 22 * i, 10) for i, line in enumerate(lines[:8])]
            upright = PageSpec(raster=raster, items=items)
            if (doc_id + page_no) % 7 == 0:
                rotate = (90, 180, 270)[(doc_id + page_no) % 3]
                pages.append(_inverse_rotate_page(upright, rotate))
            else:
                pages.append(upright)
        page_no += 1
    return {
        "doc_id": f"doc{doc_id:06d}",
        "pdf_bytes": write_pdf(pages),
        "n_pages": len(pages),
    }
