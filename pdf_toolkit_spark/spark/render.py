"""Distributed `render` command twin (reference render.py:40-170):
PDF pages -> PNG rasters at a requested DPI.

The reference walks one PDF with fitz, renders each selected page at
``zoom = dpi / 72`` and writes ``{prefix}_p{page:0{digits}d}.png``
files. The distributed twin maps the same semantics over a documents
relation: one Arrow-batched stage parses each doc, applies the strict
page-spec filter against that doc's page count, resamples the page
raster by the zoom factor (kernels.resample_nearest for scan-backed
pages; scan-LESS pages rasterize deterministically through the bitfont
microfont — no vector rasterizer or font files exist in this
container, so legibility is approximate but pixels are exact functions
of the page content), and emits
(doc_id, page_no, name, png) rows for a media-table write. Zero-padded
names reproduce the reference's sortable naming (render.py:27-37), and
per-doc failures (bad spec, corrupt PDF) become 'error' rows instead
of stage failures.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RENDER_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("page_no", T.IntegerType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("png", T.BinaryType(), True),
    T.StructField("status", T.StringType(), False),
    T.StructField("error", T.StringType(), True),
])


#: Accumulator counting pages PNG-encoded by the most recent
#: `render_pages` relation (tests pin that metadata-only mode never
#: pays the encode bill — column pruning cannot reach inside
#: mapInPandas, so the flag is the pruning mechanism).
png_encode_acc = None


def render_pages(
    docs: DataFrame, dpi: int = 144, pages: str = "all", prefix: str = "page",
    with_png: bool = True,
) -> DataFrame:
    """(doc_id, page_no, name, png, status, error): every selected page
    of every document rendered at ``dpi``. Input needs (doc_id,
    pdf_bytes) or locator-mode (doc_id, pdf_locator).

    ``with_png=False`` is the metadata-only mode: statuses/names are
    computed identically but the PNG bytes are neither encoded nor
    carried (callers projecting only metadata must set it — Spark's
    column pruning stops at the mapInPandas boundary)."""

    from ..pagespec import validate_positive_int

    global png_encode_acc
    validate_positive_int(int(dpi), "--dpi")
    zoom = float(dpi) / 72.0
    acc = docs.sparkSession.sparkContext.accumulator(0)
    png_encode_acc = acc

    def render_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import kernels as K
        from ..pagespec import compute_page_digits, parse_page_spec
        from ..pdfio.parser import PdfDocument
        from ..pdfio.png import encode_png

        cols = [f.name for f in RENDER_SCHEMA.fields]
        for batch in batches:
            by_locator = "pdf_locator" in batch.columns
            carrier = batch["pdf_locator"] if by_locator else batch["pdf_bytes"]
            rows: list[tuple] = []
            for doc_id, payload in zip(batch["doc_id"], carrier):
                try:
                    if by_locator:
                        with open(payload, "rb") as fh:
                            data = fh.read()
                    else:
                        data = bytes(payload)
                    doc = PdfDocument(data)
                    indices = parse_page_spec(pages, doc.page_count)
                    digits = compute_page_digits([i + 1 for i in indices])
                    for idx in indices:
                        page = doc.load_page(idx)
                        raster = page.scan
                        name = f"{prefix}_p{idx + 1:0{digits}d}.png"
                        if with_png:
                            if raster is not None:
                                # fitz renders the page as DISPLAYED:
                                # /Rotate applies before the zoom matrix.
                                r = K.rotate_image_cw(raster, page.rotate % 360)
                                out = K.resample_nearest(r, zoom)
                            else:
                                # scan-less page: deterministic microfont
                                # rasterization (closes the F3 gap — the
                                # reference rasterizes every page).
                                from ..bitfont import rasterize_text_page

                                out = K.rotate_image_cw(
                                    rasterize_text_page(
                                        page.width, page.height, page.items, zoom
                                    ),
                                    page.rotate % 360,
                                )
                            acc.add(1)
                            png = encode_png(out)
                        else:
                            png = None
                        rows.append((doc_id, idx, name, png, "written", None))
                except Exception as exc:
                    rows.append((doc_id, None, None, None, "error",
                                 f"{type(exc).__name__}: {exc}"))
            yield pd.DataFrame(rows, columns=cols)

    return docs.mapInPandas(render_batch, schema=RENDER_SCHEMA)
