"""Serial extraction pipeline tests: generator-plan oracles (text
content/order known by construction), rotation normalization, spread
assignment, boilerplate strip, chunked-vs-whole equality, determinism."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_toolkit_spark.config import effective_config
from pdf_toolkit_spark.corpus import corpus_config, iter_corpus, make_document
from pdf_toolkit_spark.extract import (
    boilerplate_threshold,
    extract_document,
    media_ref_for,
    normalize_text,
    strip_and_order,
)
from pdf_toolkit_spark.pagespec import chunk_ranges
from pdf_toolkit_spark.pdfio.writer import PageSpec, write_pdf

CFG = corpus_config()


def _bright(h=200, w=140, fill=245):
    return np.full((h, w), fill, dtype=np.uint8)


def test_normalize_text_masks_digits_and_whitespace():
    assert normalize_text("  Page   12 ") == "page ##"
    assert normalize_text("A\tB\nC") == "a b c"


def test_plain_text_spans_match_written_sentences_in_order():
    pdf = write_pdf([
        PageSpec(raster=_bright(), items=[("text", "alpha one", 30, 10),
                                          ("text", "beta two", 60, 10)]),
        PageSpec(raster=_bright(), items=[("text", "gamma three", 30, 10)]),
    ])
    out = extract_document(pdf, CFG)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "text"]
    assert texts == ["alpha one", "beta two", "gamma three"]
    kinds = [s["kind"] for s in out["spans"]]
    # one scan image span per crop-only page, after its texts
    assert kinds == ["text", "text", "image", "text", "image"]
    assert [s["offset"] for s in out["spans"]] == list(range(5))


def test_rotation_normalization_recovers_upright_layout():
    """A page stored rotated must produce the same spans as its upright
    twin (identical scan media_ref, identical text), and count a fix."""

    from pdf_toolkit_spark.corpus import _inverse_rotate_page

    upright = PageSpec(raster=_bright(), items=[("text", "top line", 20, 10),
                                                ("text", "bottom line", 180, 10)])
    for rot in (90, 180, 270):
        stored = _inverse_rotate_page(upright, rot)
        out_rot = extract_document(write_pdf([stored]), CFG)
        out_up = extract_document(write_pdf([upright]), CFG)
        assert out_rot["spans"] == out_up["spans"], f"rotation {rot} broke span equality"
        assert out_rot["counters"]["rotations_fixed"] == 1
        assert out_up["counters"]["rotations_fixed"] == 0


def test_spread_split_assigns_text_to_halves_and_counts():
    doc = make_document(2, seed=42)  # doc_id 2 -> spread_book
    assert doc["doc_class"] == "spread_book"
    out = extract_document(doc["pdf_bytes"], CFG)
    assert out["counters"]["spreads_split"] == doc["n_pages"]
    # each spread page yields exactly two scan image spans (left, right)
    image_spans = [s for s in out["spans"] if s["kind"] == "image"]
    assert len(image_spans) == 2 * doc["n_pages"]
    # media refs are content-addressed and deterministic
    again = extract_document(doc["pdf_bytes"], CFG)
    assert out["spans"] == again["spans"]


def test_boilerplate_header_and_page_numbers_stripped():
    bodies = ["alpha body", "beta body", "gamma body", "delta body", "eps body"]
    pages = []
    for p in range(5):
        pages.append(PageSpec(raster=_bright(), items=[
            ("text", "RUNNING HEADER", 4, 30),
            ("text", bodies[p], 100, 10),
            ("text", str(p + 1), 195, 70),
        ]))
    out = extract_document(write_pdf(pages), CFG)
    texts = [s["text"] for s in out["spans"] if s["kind"] == "text"]
    assert texts == bodies
    # short docs keep their headers (threshold floor = 3)
    out2 = extract_document(write_pdf(pages[:2]), CFG)
    texts2 = [s["text"] for s in out2["spans"] if s["kind"] == "text"]
    assert "RUNNING HEADER" in texts2


def test_boilerplate_threshold_math():
    cfg = effective_config()
    assert boilerplate_threshold(2, cfg) == 3   # floor wins
    assert boilerplate_threshold(10, cfg) == 6  # ceil(0.6*10)
    assert boilerplate_threshold(11, cfg) == 7


def test_chunked_extraction_equals_whole_doc():
    """Mega-PDF salting invariant: extracting page chunks independently
    then stripping/ordering globally == whole-doc extraction."""

    doc = make_document(49, seed=42, mega_every=50)  # mega_pdf
    assert doc["doc_class"] == "mega_pdf"
    whole = extract_document(doc["pdf_bytes"], CFG)

    all_cands = []
    for lo, hi in chunk_ranges(doc["n_pages"], 64):
        part = extract_document(doc["pdf_bytes"], CFG, page_range=(lo, hi))
        all_cands.extend(part["candidates"])
    rebuilt = strip_and_order(all_cands, doc["n_pages"], CFG)
    assert rebuilt == whole["spans"]


def test_all_dark_page_falls_back_to_full_image():
    doc = make_document(5, seed=42)  # all_dark
    assert doc["doc_class"] == "all_dark"
    out = extract_document(doc["pdf_bytes"], CFG)
    notes = out["lineage"][0]["notes"]
    assert any("used full image" in n for n in notes)


def test_corpus_is_deterministic():
    a = make_document(7, seed=42)
    b = make_document(7, seed=42)
    assert a["pdf_bytes"] == b["pdf_bytes"]
    c = make_document(7, seed=43)
    assert c["pdf_bytes"] != a["pdf_bytes"]


def test_media_ref_shape_sensitivity():
    flat = np.zeros((2, 8), dtype=np.uint8)
    tall = np.zeros((8, 2), dtype=np.uint8)
    assert media_ref_for(flat) != media_ref_for(tall)
    assert media_ref_for(flat).startswith("sha256:")


@pytest.mark.parametrize("doc_id", range(12))
def test_every_corpus_class_extracts_cleanly(doc_id):
    doc = make_document(doc_id, seed=42, mega_every=0)  # no megas here
    out = extract_document(doc["pdf_bytes"], CFG)
    assert out["counters"]["pages_parsed"] == doc["n_pages"]
    assert out["spans"], f"{doc['doc_class']} produced no spans"
    offsets = [s["offset"] for s in out["spans"]]
    assert offsets == list(range(len(offsets)))
