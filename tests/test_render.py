"""`render` command twin: DPI resampling of page rasters, distributed
vs serial parity, page-spec filtering, error isolation, CLI smoke."""

from __future__ import annotations

import numpy as np
import pytest

from pdf_toolkit_spark import kernels as K
from pdf_toolkit_spark.corpus import make_document
from pdf_toolkit_spark.pdfio.parser import PdfDocument
from pdf_toolkit_spark.pdfio.png import decode_png
from pdf_toolkit_spark.spark.input import corpus_dataframe
from pdf_toolkit_spark.spark.render import render_pages


def test_resample_nearest_dims_and_identity():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(37, 53)).astype(np.uint8)
    assert np.array_equal(K.resample_nearest(a, 1.0), a)
    z = K.resample_nearest(a, 2.0)
    assert z.shape == (74, 106)
    # each output pixel is an exact source pixel (nearest, no blending)
    assert set(np.unique(z)) <= set(np.unique(a))
    half = K.resample_nearest(a, 0.5)
    assert half.shape == (int(np.floor(37 * 0.5 + 0.5)), int(np.floor(53 * 0.5 + 0.5)))


def test_render_pages_matches_serial(spark):
    """Distributed render == serial (parse -> /Rotate -> resample ->
    PNG) per page, with zero-padded sortable names."""

    n = 6
    docs = corpus_dataframe(spark, n, seed=42, mega_every=0)
    rows = render_pages(docs, dpi=144).collect()
    by_doc: dict[str, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)

    saw_rotated = False
    for doc_id in range(n):
        doc = make_document(doc_id, seed=42, mega_every=0)
        pdoc = PdfDocument(doc["pdf_bytes"])
        got = sorted(by_doc[doc["doc_id"]], key=lambda r: r["page_no"])
        assert len(got) == pdoc.page_count
        for r in got:
            page = pdoc.load_page(r["page_no"])
            assert r["status"] == "written"
            expected = K.resample_nearest(
                K.rotate_image_cw(page.scan, page.rotate % 360), 2.0
            )
            saw_rotated = saw_rotated or page.rotate % 360 != 0
            arr = decode_png(bytes(r["png"]))
            assert np.array_equal(arr, expected), (doc_id, r["page_no"])
            assert r["name"].startswith("page_p") and r["name"].endswith(".png")
            assert r["name"] == f"page_p{r['page_no'] + 1:04d}.png"
    assert saw_rotated  # the corpus included a rotated_scan doc


def test_render_page_spec_and_error_isolation(spark):
    from pdf_toolkit_spark.spark.schema import DOCUMENTS_RAW_SCHEMA

    good = make_document(0, seed=42, mega_every=0)  # plain_text, >=1 pages
    df = spark.createDataFrame(
        [("ok", bytearray(good["pdf_bytes"]), good["n_pages"]),
         ("bad", bytearray(b"nope"), 1)],
        schema=DOCUMENTS_RAW_SCHEMA,
    )
    rows = render_pages(df, dpi=72, pages="1").collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc["ok"]["status"] == "written" and by_doc["ok"]["page_no"] == 0
    assert len([r for r in rows if r["doc_id"] == "ok"]) == 1  # spec filtered
    assert by_doc["bad"]["status"] == "error" and "PDF" in by_doc["bad"]["error"]
    # out-of-range spec is a PER-DOC error, not a stage failure
    rows = render_pages(df.filter("doc_id = 'ok'"), dpi=72, pages="99").collect()
    assert rows[0]["status"] == "error"


def test_render_job_cli_smoke(spark, tmp_path):
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "render_job", Path(__file__).resolve().parents[1] / "jobs" / "render_job.py")
    render_job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(render_job)
    out = str(tmp_path / "rendered")
    rc = render_job.main(
        ["--gen-docs", "3", "--output", out, "--dpi", "36"], _spark=spark)
    assert rc == 0
    tbl = spark.read.parquet(out)
    assert tbl.filter("status = 'written'").count() >= 3
    one = tbl.filter("status = 'written'").first()
    assert decode_png(bytes(one["png"])).ndim in (2, 3)


def test_metadata_only_mode_skips_png_encode(spark):
    """with_png=False must produce identical metadata without paying the
    encode bill (pinned via the encode accumulator — column pruning
    cannot reach inside mapInPandas)."""

    from pdf_toolkit_spark.spark import render as R

    docs = corpus_dataframe(spark, 6, seed=42, mega_every=0)
    meta = render_pages(docs, dpi=36, with_png=False)
    rows = meta.collect()
    assert R.png_encode_acc.value == 0
    assert all(r["png"] is None for r in rows)
    written_meta = sorted(
        (r["doc_id"], r["page_no"], r["name"], r["status"]) for r in rows
    )

    full = render_pages(docs, dpi=36)
    frows = full.collect()
    n_written = sum(1 for r in frows if r["status"] == "written")
    assert R.png_encode_acc.value == n_written > 0
    assert written_meta == sorted(
        (r["doc_id"], r["page_no"], r["name"], r["status"]) for r in frows
    )


def test_text_only_pages_rasterize_deterministically(spark):
    """Scan-less pages no longer skip: they rasterize through the
    bitfont microfont, pixel-identical to the serial rasterizer, and
    scale with dpi (F3 closure — the reference renders every page)."""

    from pdf_toolkit_spark.bitfont import rasterize_text_page

    content = b"BT /F1 12 Tf 10 60 Td (HELLO 123) Tj ET"
    chunks = [
        b"%PDF-1.4\n",
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n",
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n",
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 200 100] "
        b"/Contents 4 0 R >>\nendobj\n",
        b"4 0 obj\n<< /Length %d >>\nstream\n" % len(content)
        + content + b"\nendstream\nendobj\n",
    ]
    pdf = bytearray()
    offs = {}
    for i, c in enumerate(chunks):
        if i:
            offs[i] = len(pdf)
        pdf += c
    xref_at = len(pdf)
    pdf += b"xref\n0 5\n0000000000 65535 f \n"
    for i in range(1, 5):
        pdf += b"%010d 00000 n \n" % offs[i]
    pdf += b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_at
    pdf = bytes(pdf)

    docs = spark.createDataFrame(
        [("textdoc", pdf, 1)], "doc_id string, pdf_bytes binary, n_pages int"
    )
    for dpi, zoom in ((72, 1.0), (144, 2.0)):
        rows = render_pages(docs, dpi=dpi).collect()
        assert len(rows) == 1 and rows[0]["status"] == "written"
        arr = decode_png(bytes(rows[0]["png"]))
        page = PdfDocument(pdf).load_page(0)
        expected = rasterize_text_page(page.width, page.height, page.items, zoom)
        assert np.array_equal(arr, expected)
        assert arr.shape == (int(100 * zoom), int(200 * zoom))
        assert (arr == 0).sum() > 0  # glyph ink present
    # ink scales ~4x from 72 to 144 dpi (scale doubles both axes)


def test_bitfont_glyphs_are_distinct_and_wellformed():
    from pdf_toolkit_spark.bitfont import _ART, _glyph

    seen = {}
    for ch, art in _ART.items():
        assert len(art) == 5 and all(len(r) == 3 for r in art), ch
        key = tuple(art)
        if ch != " ":
            assert key not in seen or ch in ".,", (ch, seen.get(key))
            seen.setdefault(key, ch)
    assert _glyph("a").tolist() == _glyph("A").tolist()  # case folding
    assert _glyph("世").any()  # unknown -> checker block, not blank
