"""RGB image support: color PNG codec, DeviceRGB XObjects through the
writer/parser, color scans through the extraction kernels (gray
analysis, color crops), and color media blobs."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import make_synthetic_spread

from pdf_toolkit_spark import kernels as K
from pdf_toolkit_spark.corpus import corpus_config, make_document
from pdf_toolkit_spark.extract import extract_document, extract_page, media_ref_for
from pdf_toolkit_spark.pdfio import PageSpec, PdfDocument, write_pdf
from pdf_toolkit_spark.pdfio.parser import ParsedPage
from pdf_toolkit_spark.pdfio.png import decode_png, encode_png

CFG = corpus_config()


def _rgb(gray: np.ndarray, jitter: int = 0) -> np.ndarray:
    """Stack gray into RGB; jitter shifts G/B so channels differ."""

    g = np.clip(gray.astype(np.int32) + jitter, 0, 255).astype(np.uint8)
    b = np.clip(gray.astype(np.int32) - jitter, 0, 255).astype(np.uint8)
    return np.stack([gray, g, b], axis=-1)


def test_png_rgb_roundtrip():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(23, 17, 3), dtype=np.uint8)
    png = encode_png(arr)
    got = decode_png(png)
    assert got.shape == (23, 17, 3) and np.array_equal(got, arr)


def test_writer_parser_rgb_roundtrip():
    raster = _rgb(make_synthetic_spread(), jitter=5)
    emb = np.arange(10 * 12 * 3, dtype=np.uint8).reshape(10, 12, 3)
    pdf = write_pdf([PageSpec(raster=raster, items=[("image", emb, 30, 40)])])
    page = PdfDocument(pdf).load_page(0)
    assert page.scan is not None and page.scan.shape == raster.shape
    assert np.array_equal(page.scan, raster)
    assert page.items[0][0] == "image"
    assert np.array_equal(page.items[0][1], emb)


def test_color_scan_kernel_decisions_match_gray():
    """A color scan whose channels are identical must take the exact
    same split/crop decisions as its gray twin (to_gray is identity on
    equal channels); only the media bytes/refs differ."""

    gray = make_synthetic_spread()
    color = _rgb(gray, jitter=0)
    pg = extract_page(ParsedPage(0, gray.shape[1], gray.shape[0], 0, gray, []), 0, CFG)
    pc = extract_page(ParsedPage(0, color.shape[1], color.shape[0], 0, color, []), 0, CFG)
    assert pg.lineage["gutter_x"] == pc.lineage["gutter_x"]
    assert pg.lineage["left_bbox"] == pc.lineage["left_bbox"]
    assert pg.lineage["right_bbox"] == pc.lineage["right_bbox"]
    assert [c.kind for c in pc.candidates] == [c.kind for c in pg.candidates]
    # color media decodes to 3-channel crops content-addressed per ref
    for ref, blob in pc.media.items():
        arr = decode_png(blob)
        assert arr.ndim == 3
        assert media_ref_for(arr) == ref
    # gray and color refs must NOT collide (channel count is hashed)
    assert set(pg.media).isdisjoint(pc.media)


def test_corpus_color_mixed_doc_extracts_with_rgb_media():
    # doc 4 is the 'mixed' class with color=True ((4 // 6) % 2 == 0)
    doc = make_document(4, seed=42, mega_every=0)
    assert doc["doc_class"] == "mixed"
    res = extract_document(doc["pdf_bytes"], CFG)
    assert len(res["spans"]) > 0
    shapes = {decode_png(b).ndim for b in res["media"].values()}
    assert 3 in shapes  # at least one RGB blob (scan/crops + embedded)


def test_rotation_normalization_applies_to_color_scans():
    gray = make_synthetic_spread()
    color = _rgb(gray, jitter=7)
    rotated = K.rotate_image_cw(color, 270)  # stored orientation
    h, w = rotated.shape[:2]
    page = ParsedPage(0, w, h, 90, rotated, [])
    res = extract_page(page, 0, CFG)
    # after normalizing the 90-degree /Rotate the spread splits again
    assert res.lineage["mode_used"] == "split"
    assert res.counters["rotations_fixed"] == 1
