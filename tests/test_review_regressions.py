"""Regression tests for code-review findings: PDF-spec conformance
(relative Td, nested-paren strings, /Contents arrays, /Prev xref
chains), job robustness (n_pages<=0, empty docs, mixed-chunk failures,
resume error propagation), and streaming out-of-order sessions."""

from __future__ import annotations

import re

import numpy as np
import pytest

from pdf_toolkit_spark.corpus import corpus_config, make_document
from pdf_toolkit_spark.pdfio import PageSpec, PdfDocument, write_pdf
from pdf_toolkit_spark.pdfio.parser import _NESTED_PAREN_RE

CFG = corpus_config()


# --- content-stream semantics ---


def _texts(stream: bytes, page_h: int = 800):
    return [p for k, p in PdfDocument._tokenize_content(stream, page_h) if k == "text"]


def test_td_is_relative_to_line_start():
    stream = b"BT 100 700 Td (line1) Tj 0 -20 Td (line2) Tj ET"
    got = _texts(stream)
    assert got[0] == ("line1", 100, 100)   # row = 800 - 700
    assert got[1] == ("line2", 120, 100)   # 0 -20 Td moves DOWN 20, same col


def test_tm_sets_absolute_position_and_bt_resets():
    stream = b"BT 50 50 Td 1 0 0 1 10 790 Tm (abs) Tj ET BT (origin) Tj ET"
    got = _texts(stream)
    assert got[0] == ("abs", 10, 10)
    assert got[1] == ("origin", 800, 0)


def test_nested_paren_strings_fall_back_and_parse_correctly():
    stream = b"BT 10 700 Td (a(b)c) Tj ET"
    assert _NESTED_PAREN_RE.search(stream)  # routed to the general lexer
    got = _texts(stream)
    assert got == [("a(b)c", 100, 10)]


# --- handcrafted PDFs for container-level spec features ---


def _raw_pdf(objects: list[bytes], root_num: int) -> bytes:
    """Assemble a classic-xref PDF from raw object bodies (1-based)."""

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root {root_num} 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_contents_array_of_streams_is_concatenated():
    s1 = b"BT 10 90 Td (first) Tj ET"
    s2 = b"BT 10 50 Td (second) Tj ET"
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
        b"/Contents [4 0 R 5 0 R] >>",
        f"<< /Length {len(s1)} >>\nstream\n".encode() + s1 + b"\nendstream",
        f"<< /Length {len(s2)} >>\nstream\n".encode() + s2 + b"\nendstream",
    ]
    doc = PdfDocument(_raw_pdf(objects, root_num=1))
    page = doc.load_page(0)
    assert [(it[1], it[2]) for it in page.items] == [("first", 10), ("second", 50)]


def test_incremental_update_prev_xref_chain():
    base = write_pdf([PageSpec(raster=np.full((20, 30), 200, dtype=np.uint8),
                               items=[("text", "hello", 5, 5)])])
    old_startxref = int(re.search(rb"startxref\s+(\d+)", base[-200:]).group(1))
    n_objs = int(re.search(rb"/Size (\d+)", base[-300:]).group(1))
    root = int(re.search(rb"/Root (\d+) 0 R", base[-300:]).group(1))

    # append an incremental update: one new (unreferenced) object + a
    # second xref section chaining back via /Prev
    new_num = n_objs
    add = bytearray(base)
    new_off = len(add)
    add += f"{new_num} 0 obj\n<< /Type /Metadata >>\nendobj\n".encode()
    xref_at = len(add)
    add += f"xref\n{new_num} 1\n{new_off:010d} 00000 n \n".encode()
    add += (
        f"trailer\n<< /Size {n_objs + 1} /Root {root} 0 R /Prev {old_startxref} >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()

    doc = PdfDocument(bytes(add))
    assert doc.page_count == 1
    page = doc.load_page(0)
    assert page.items[0][1] == "hello"          # old objects still resolve
    assert doc.resolve(doc._load_object(new_num))["Type"] == "Metadata"


def _textless_pdf(contents: list[bytes]) -> bytes:
    """Pages with raw content streams and no images (scan=None)."""

    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
    ]
    kids = []
    next_num = 3
    page_objs = []
    for c in contents:
        page_objs.append((next_num, c))
        kids.append(f"{next_num} 0 R")
        next_num += 2
    objects.append(
        f"<< /Type /Pages /Kids [{' '.join(kids)}] /Count {len(contents)} >>".encode()
    )
    for num, c in page_objs:
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
            f"/Contents {num + 1} 0 R >>".encode()
        )
        objects.append(f"<< /Length {len(c)} >>\nstream\n".encode() + c + b"\nendstream")
    return _raw_pdf(objects, root_num=1)


# --- job-level robustness ---


def test_empty_doc_commits_empty_spans_and_resume_converges(spark, tmp_path):
    from pdf_toolkit_spark.spark.job import run_extraction
    from pdf_toolkit_spark.spark.schema import DOCUMENTS_RAW_SCHEMA

    empty_pdf = _textless_pdf([b""])  # one page, no content at all
    df = spark.createDataFrame(
        [("empty", bytearray(empty_pdf), 1)], schema=DOCUMENTS_RAW_SCHEMA
    )
    out = str(tmp_path / "out")
    r1 = run_extraction(spark, df, CFG, out_dir=out, run_id="e1")
    assert r1.metrics["docs_processed"] == 1
    rows = spark.read.parquet(f"{out}/spans").collect()
    assert len(rows) == 1 and rows[0]["spans"] == []
    # resume must now skip it — previously it was re-extracted forever
    r2 = run_extraction(spark, df, CFG, out_dir=out, run_id="e2")
    assert r2.metrics["docs_processed"] == 0


def test_n_pages_zero_row_does_not_kill_stage(spark):
    from pdf_toolkit_spark.spark.job import run_extraction
    from pdf_toolkit_spark.spark.schema import DOCUMENTS_RAW_SCHEMA

    good = make_document(0, seed=42, mega_every=0)
    df = spark.createDataFrame(
        [
            ("ok", bytearray(good["pdf_bytes"]), good["n_pages"]),
            ("zero", bytearray(b"junk"), 0),
            ("negative", bytearray(b"junk"), -3),
        ],
        schema=DOCUMENTS_RAW_SCHEMA,
    )
    r = run_extraction(spark, df, CFG)
    assert r.metrics["docs_processed"] == 1
    assert r.metrics["docs_failed"] == 2


def test_mixed_chunk_failure_counts_doc_as_failed_only(spark):
    """A doc whose metadata claims more pages than exist: early chunks
    succeed, later chunks fail -> the doc is failed, not double-counted."""

    from pdf_toolkit_spark.spark.job import build_pipeline, run_extraction
    from pdf_toolkit_spark.spark.schema import DOCUMENTS_RAW_SCHEMA

    pages = [b"BT 10 50 Td (p) Tj ET"] * 40  # 40 real pages
    pdf = _textless_pdf(pages)
    cfg = dict(CFG, pages_per_chunk=32)
    df = spark.createDataFrame(
        [("liar", bytearray(pdf), 64)], schema=DOCUMENTS_RAW_SCHEMA  # claims 64
    )
    r = run_extraction(spark, df, cfg)
    assert r.metrics["docs_failed"] == 1
    assert r.metrics["docs_processed"] == 0  # was 1 before the fix
    spans_df, _ = build_pipeline(spark, df, cfg)
    assert spans_df.count() == 0  # no partial commit


def test_resume_read_failure_is_not_swallowed(spark, tmp_path):
    from pdf_toolkit_spark.spark.job import run_extraction
    from pdf_toolkit_spark.spark.schema import DOCUMENTS_RAW_SCHEMA

    out = str(tmp_path / "out")
    # corrupt committed state: spans dir exists but is unreadable parquet
    spans_dir = tmp_path / "out" / "spans"
    spans_dir.mkdir(parents=True)
    (spans_dir / "part-00000.parquet").write_bytes(b"not parquet at all")

    good = make_document(0, seed=42, mega_every=0)
    df = spark.createDataFrame(
        [("ok", bytearray(good["pdf_bytes"]), good["n_pages"])],
        schema=DOCUMENTS_RAW_SCHEMA,
    )
    with pytest.raises(Exception):
        run_extraction(spark, df, CFG, out_dir=out, run_id="r1")
