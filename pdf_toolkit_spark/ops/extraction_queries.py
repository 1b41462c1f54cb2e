"""Driver-contract wrappers for the extraction pipeline itself: wrap
the testdata ``documents`` table into deterministic PDF byte streams
(executor-side) and run the full distributed extraction. Non-SQL by
nature (binary parse kernel) -> rows-only driver check; exactness is
covered by tests/test_spark_job.py against the serial oracle."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..corpus import corpus_config
from ..spark.job import build_pipeline
from ..spark.schema import DOCUMENTS_RAW_SCHEMA
from .common import table


def documents_as_pdfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pdf_bytes, n_pages): testdata documents wrapped into
    fixture PDFs on the executors (deterministic in doc_id + text)."""

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..corpus import document_from_text

        for batch in batches:
            made = [document_from_text(int(i), t) for i, t in zip(batch["doc_id"], batch["text"])]
            yield pd.DataFrame(
                {
                    "doc_id": [m["doc_id"] for m in made],
                    "pdf_bytes": [m["pdf_bytes"] for m in made],
                    "n_pages": [m["n_pages"] for m in made],
                }
            )

    return docs.repartition(spark.sparkContext.defaultParallelism).mapInPandas(
        wrap, schema=DOCUMENTS_RAW_SCHEMA
    )


def extract_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: full distributed extraction over PDFs synthesized
    from the documents table. Output: (doc_id, n_spans, n_text_spans,
    n_image_spans) — a stable scalar projection of the span arrays."""

    raw = documents_as_pdfs(spark, sf_dir)
    spans, _ = build_pipeline(spark, raw, corpus_config())
    is_text = lambda s: s["kind"] == F.lit("text")  # noqa: E731
    return spans.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(F.filter("spans", is_text)).alias("n_text_spans"),
        (F.size("spans") - F.size(F.filter("spans", is_text))).alias("n_image_spans"),
    )


def extract_full_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full span arrays (the SPANS_SCHEMA output) for the synthesized
    corpus — the DataFrame the driver's entry() smoke-check collects."""

    raw = documents_as_pdfs(spark, sf_dir)
    spans, _ = build_pipeline(spark, raw, corpus_config())
    return spans


QUERIES = {
    "extract_spans": extract_spans,
}

ORACLES: dict[str, str] = {}
