"""Writer -> parser round-trip tests for the pure-Python PDF layer."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_toolkit_spark.errors import UserError
from pdf_toolkit_spark.pdfio import PageSpec, PdfDocument, write_pdf

from conftest import make_synthetic_spread


def _page(raster, rotate=0, items=()):
    return PageSpec(raster=raster, rotate=rotate, items=list(items))


def test_roundtrip_single_text_page():
    raster = np.full((100, 80), 245, dtype=np.uint8)
    pdf = write_pdf([_page(raster, items=[("text", "hello world", 20, 10)])])
    doc = PdfDocument(pdf)
    assert doc.page_count == 1
    page = doc.load_page(0)
    assert (page.width, page.height, page.rotate) == (80, 100, 0)
    assert np.array_equal(page.scan, raster)
    assert page.items == [("text", "hello world", 20, 10)]


def test_roundtrip_preserves_item_order_and_images():
    raster = make_synthetic_spread()
    img = np.full((10, 20), 99, dtype=np.uint8)
    items = [
        ("text", "first", 30, 40),
        ("image", img, 50, 60),
        ("text", "second", 70, 80),
    ]
    doc = PdfDocument(write_pdf([_page(raster, items=items)]))
    page = doc.load_page(0)
    kinds = [it[0] for it in page.items]
    assert kinds == ["text", "image", "text"]
    assert page.items[0][1] == "first"
    assert page.items[2][1] == "second"
    got_img = page.items[1][1]
    assert np.array_equal(got_img, img)
    assert page.items[1][2:] == (50, 60)  # row, col preserved
    assert np.array_equal(page.scan, raster)


def test_roundtrip_rotation_flag_and_multi_page():
    r0 = np.full((50, 40), 200, dtype=np.uint8)
    r1 = np.full((40, 50), 100, dtype=np.uint8)
    doc = PdfDocument(write_pdf([_page(r0, rotate=90), _page(r1, rotate=270)]))
    assert doc.page_count == 2
    assert doc.load_page(0).rotate == 90
    assert doc.load_page(1).rotate == 270


def test_deterministic_bytes():
    raster = np.arange(100, dtype=np.uint8).reshape(10, 10)
    pages = [_page(raster, items=[("text", "x (y) \\z", 1, 2)])]
    assert write_pdf(pages) == write_pdf(pages)


def test_string_escaping_roundtrip():
    raster = np.full((20, 20), 255, dtype=np.uint8)
    tricky = r"parens () and backslash \ ok"
    doc = PdfDocument(write_pdf([_page(raster, items=[("text", tricky, 5, 5)])]))
    assert doc.load_page(0).items[0][1] == tricky


def test_not_a_pdf_raises():
    with pytest.raises(UserError, match="%PDF"):
        PdfDocument(b"GIF89a not a pdf")


def test_page_index_out_of_range():
    doc = PdfDocument(write_pdf([_page(np.zeros((5, 5), dtype=np.uint8))]))
    with pytest.raises(UserError, match="out of range"):
        doc.load_page(1)


def test_lazy_page_count_does_not_decode_streams():
    pages = [_page(np.full((200, 300), 128, dtype=np.uint8)) for _ in range(20)]
    doc = PdfDocument(write_pdf(pages))
    assert doc.page_count == 20
    assert doc._decoded_streams == {}  # nothing decoded until load_page
    doc.load_page(3)
    assert len(doc._decoded_streams) >= 1
