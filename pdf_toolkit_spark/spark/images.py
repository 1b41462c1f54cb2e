"""Standalone image-folder sources and jobs.

The reference's ``page-images`` and ``rotate images`` commands consume a
DIRECTORY OF PNGs, not PDFs (reference page_images.py:25-28,
rotate.py:172-175): ``sorted(in_dir.glob(pattern))`` then the per-image
kernel pipeline. This module is their distributed twin:

- :func:`read_image_folder` — ``binaryFile`` scan with a glob filter
  (S1/S3 in SURVEY.md §2.1); deterministic identity comes from the file
  name, not scan order (Spark scans are unordered by design).
- :func:`extract_image_folder` — the full page-images kernel path
  (spread detect -> gutter split -> crop -> symmetry -> media refs) over
  each image, emitting the same RECORDS/SPANS relations as the PDF
  pipeline. One image behaves exactly like a one-page scan-only PDF
  page, so kernel semantics are pinned by the same tests.
- :func:`rotate_image_folder` — ``rotate images`` (reference
  rotate.py:178-307): clockwise right-angle rotation of every raster,
  returned as (image_id, png) rows for a media-table write.

All Python work is Arrow-batched ``mapInPandas`` over binary columns —
no per-row UDFs, same boundary discipline as the PDF job.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULTS, validate_config
from .job import assemble_spans, strip_boilerplate
from .schema import RECORDS_SCHEMA


def read_image_folder(spark: SparkSession, path: str, pattern: str = "*.png") -> DataFrame:
    """(image_id, png): deterministic-identity scan of an image folder.

    ``image_id`` is the file's base name — the analog of the reference's
    sorted-glob processing order (page_images.py:25-28): downstream
    relations key and sort on it explicitly instead of relying on scan
    order."""

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
    )
    return raw.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("image_id"),
        F.col("content").alias("png"),
    )


def _make_image_extract_batch(cfg: dict[str, Any]):
    cols = [f.name for f in RECORDS_SCHEMA.fields]

    def image_extract_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..extract import extract_page
        from ..pdfio.parser import ParsedPage
        from ..pdfio.png import decode_png

        import json as _json

        for batch in batches:
            rows: list[tuple] = []
            for image_id, png in zip(batch["image_id"], batch["png"]):
                try:
                    arr = decode_png(bytes(png))  # gray or RGB
                    h, w = arr.shape[:2]
                    page = ParsedPage(index=0, width=w, height=h, rotate=0,
                                      scan=arr, items=[])
                    result = extract_page(page, 0, cfg)
                    c = result.counters
                    payload = (
                        result.lineage.get("detail_json"),
                        result.lineage.get("status", "ok"),
                        c.get("pages_parsed", 1),
                        c.get("rotations_fixed", 0),
                        c.get("spreads_split", 0),
                        c.get("crop_only", 0),
                    )
                    for ref, blob in result.media.items():
                        rows.append((image_id, 1, 0, 0, 0, "media", None, None,
                                     None, None, ref, blob, *(None,) * 6))
                    for i, cand in enumerate(result.candidates):
                        pl = payload if i == 0 else (None,) * 6
                        rows.append((image_id, 1, cand.page_no, cand.region_idx,
                                     cand.item_idx, cand.kind, cand.text,
                                     cand.norm_text, cand.y_band,
                                     cand.is_page_number, cand.media_ref, None, *pl))
                except Exception as exc:
                    detail = _json.dumps(
                        {"error": f"{type(exc).__name__}: {exc}"}, sort_keys=True
                    )
                    rows.append((image_id, 1, 0, 0, 0, "none", None, None, None,
                                 None, None, None, detail, "error", 0, 0, 0, 0))
            yield pd.DataFrame(rows, columns=cols)

    return image_extract_batch


def extract_image_folder(
    spark: SparkSession, images: DataFrame, cfg: Optional[dict[str, Any]] = None
) -> tuple[DataFrame, DataFrame]:
    """page-images over an image relation: (spans_df, records_df) with
    the exact schemas of the PDF pipeline (one doc per image)."""

    cfg = validate_config(dict(DEFAULTS, **(cfg or {})))
    n_parts = spark.sparkContext.defaultParallelism * 4
    repart = images.repartition(n_parts, F.col("image_id"))
    records = repart.mapInPandas(_make_image_extract_batch(cfg), schema=RECORDS_SCHEMA)
    # Same narrow-exchange discipline as the PDF pipeline: media rows
    # and lineage payload columns never enter the strip/assembly
    # shuffles (they're consumed from the records branch only).
    span_rows = records.filter(F.col("kind") != "media").select(
        "doc_id", "n_pages", "page_no", "region_idx", "item_idx", "kind",
        "text", "norm_text", "y_band", "is_page_number", "media_ref", "status",
    )
    spans = assemble_spans(strip_boilerplate(span_rows, cfg))
    return spans, records


def rotate_image_folder(images: DataFrame, degrees: int) -> DataFrame:
    """(image_id, png): every raster rotated clockwise by 90/180/270
    (reference rotate.py:274-278 semantics via kernels.rotate_image_cw)."""

    if degrees % 360 not in (90, 180, 270):
        from ..errors import UserError

        raise UserError("Degrees must be one of 90, 180, 270 (clockwise).")

    def rotate_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .. import kernels as K
        from ..pdfio.png import decode_png, encode_png

        for batch in batches:
            out_ids, out_pngs = [], []
            for image_id, png in zip(batch["image_id"], batch["png"]):
                arr = K.rotate_image_cw(decode_png(bytes(png)), degrees % 360)
                out_ids.append(image_id)
                out_pngs.append(encode_png(arr))
            yield pd.DataFrame({"image_id": out_ids, "png": out_pngs})

    return images.mapInPandas(rotate_batch, "image_id string, png binary")
