"""split / rotate-pdf command twins: the parser -> writer page rebuild
must be lossless (part pages byte-equal the originals' content), part
naming must match the reference's scheme, rotate must update /Rotate
only, and failures must isolate per document."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_toolkit_spark.corpus import make_document
from pdf_toolkit_spark.errors import UserError
from pdf_toolkit_spark.pdfio.parser import PdfDocument
from pdf_toolkit_spark.spark.input import corpus_dataframe
from pdf_toolkit_spark.spark.pdfjobs import rotate_pdfs, split_pdfs


def _pages_equal(pa, pb) -> bool:
    if (pa.width, pa.height, pa.rotate) != (pb.width, pb.height, pb.rotate):
        return False
    if (pa.scan is None) != (pb.scan is None):
        return False
    if pa.scan is not None and not np.array_equal(pa.scan, pb.scan):
        return False
    if len(pa.items) != len(pb.items):
        return False
    for ia, ib in zip(pa.items, pb.items):
        if ia[0] != ib[0] or ia[2:] != ib[2:]:
            return False
        if ia[0] == "image":
            if not np.array_equal(ia[1], ib[1]):
                return False
        elif ia[1] != ib[1]:
            return False
    return True


def test_split_parts_reassemble_original(spark):
    """Every part's pages == the original's page range, content-exact
    (raster, items, rotation) — the lossless-rebuild guarantee."""

    n = 5
    docs = corpus_dataframe(spark, n, seed=42, mega_every=0)
    rows = split_pdfs(docs, pages_per_file=2).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        assert r["status"] == "written", r["error"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id in range(n):
        doc = make_document(doc_id, seed=42, mega_every=0)
        orig = PdfDocument(doc["pdf_bytes"])
        parts = sorted(by_doc[doc["doc_id"]], key=lambda r: r["part"])
        assert len(parts) == (orig.page_count + 1) // 2
        page_at = 0
        for r in parts:
            part_doc = PdfDocument(bytes(r["pdf_bytes"]))
            assert part_doc.page_count == r["n_pages"]
            lo, hi = (int(x) for x in r["page_range"].split("-"))
            assert lo == page_at + 1
            for i in range(part_doc.page_count):
                assert _pages_equal(part_doc.load_page(i), orig.load_page(page_at)), (
                    doc["doc_class"], page_at)
                page_at += 1
            assert hi == page_at
        assert page_at == orig.page_count
        # reference part naming: prefix_partNN.pdf, digits >= 2
        assert parts[0]["part_name"] == "doc_part01.pdf" or parts[0][
            "part_name"].startswith("doc_part0")


def test_split_explicit_ranges_and_arg_exclusivity(spark):
    docs = corpus_dataframe(spark, 1, seed=42, mega_every=0)  # plain_text doc
    n_pages = make_document(0, seed=42, mega_every=0)["n_pages"]
    if n_pages >= 2:
        rows = split_pdfs(docs, ranges_spec=f"1-1,2-{n_pages}").collect()
        assert [r["n_pages"] for r in sorted(rows, key=lambda r: r["part"])] == [
            1, n_pages - 1]
    with pytest.raises(UserError, match="not both"):
        split_pdfs(docs, ranges_spec="1-1", pages_per_file=2)
    with pytest.raises(UserError, match="not both"):
        split_pdfs(docs)


def test_rotate_pdf_updates_rotation_flag_only(spark):
    n = 4
    docs = corpus_dataframe(spark, n, seed=42, mega_every=0)
    rows = {r["doc_id"]: r for r in rotate_pdfs(docs, 90).collect()}
    for doc_id in range(n):
        doc = make_document(doc_id, seed=42, mega_every=0)
        orig = PdfDocument(doc["pdf_bytes"])
        r = rows[doc["doc_id"]]
        assert r["status"] == "written", r["error"]
        rotated = PdfDocument(bytes(r["pdf_bytes"]))
        assert rotated.page_count == orig.page_count
        for i in range(orig.page_count):
            pa, pb = orig.load_page(i), rotated.load_page(i)
            assert pb.rotate == (pa.rotate + 90) % 360
            assert np.array_equal(pa.scan, pb.scan)  # content untouched


def test_rotate_pdf_page_subset(spark):
    docs = corpus_dataframe(spark, 1, seed=42, mega_every=0)
    r = rotate_pdfs(docs, 180, pages="1").collect()[0]
    doc = make_document(0, seed=42, mega_every=0)
    orig = PdfDocument(doc["pdf_bytes"])
    rotated = PdfDocument(bytes(r["pdf_bytes"]))
    assert r["pages_rotated"] == 1
    assert rotated.load_page(0).rotate == (orig.load_page(0).rotate + 180) % 360
    for i in range(1, orig.page_count):
        assert rotated.load_page(i).rotate == orig.load_page(i).rotate


def test_corrupt_docs_isolated(spark):
    from pdf_toolkit_spark.spark.schema import DOCUMENTS_RAW_SCHEMA

    good = make_document(0, seed=42, mega_every=0)
    df = spark.createDataFrame(
        [("ok", bytearray(good["pdf_bytes"]), good["n_pages"]),
         ("bad", bytearray(b"junk"), 1)],
        schema=DOCUMENTS_RAW_SCHEMA)
    rows = {r["doc_id"]: r for r in rotate_pdfs(df, 90).collect()}
    assert rows["ok"]["status"] == "written"
    assert rows["bad"]["status"] == "error"


def test_pdf_job_cli_smoke(spark, tmp_path):
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "pdf_job", Path(__file__).resolve().parents[1] / "jobs" / "pdf_job.py")
    pdf_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(pdf_job)
    out = str(tmp_path / "parts")
    rc = pdf_job.main(["split", "--gen-docs", "3", "--output", out,
                       "--pages-per-file", "2"], _spark=spark)
    assert rc == 0
    assert spark.read.parquet(out).filter("status = 'written'").count() >= 3
    out2 = str(tmp_path / "rot")
    rc = pdf_job.main(["rotate", "--gen-docs", "2", "--output", out2,
                       "--degrees", "270"], _spark=spark)
    assert rc == 0
    assert spark.read.parquet(out2).filter("status = 'written'").count() == 2
