"""Input-side helpers: distributed corpus materialization and readers.

The fixture corpus is generated ON the executors (spark.range ->
mapInPandas over doc ids) — the generator is a pure function of
(seed, doc_id), so generation parallelizes like any other stage and the
driver never holds PDF bytes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .schema import DOCUMENTS_RAW_SCHEMA


def corpus_dataframe(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    mega_every: int = 50,
    partitions: int | None = None,
    profile: str = "scan",
    jpeg_every: int = 0,
    encrypt_every: int = 0,
    cid_every: int = 0,
) -> DataFrame:
    """documents_raw (doc_id, pdf_bytes, n_pages) built distributed."""

    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..corpus import make_document

        for batch in batches:
            docs = [make_document(int(i), seed=seed, mega_every=mega_every,
                                  profile=profile, jpeg_every=jpeg_every,
                                  encrypt_every=encrypt_every,
                                  cid_every=cid_every)
                    for i in batch["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [d["doc_id"] for d in docs],
                    "pdf_bytes": [d["pdf_bytes"] for d in docs],
                    "n_pages": [d["n_pages"] for d in docs],
                }
            )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=DOCUMENTS_RAW_SCHEMA)
    )


def read_documents_raw(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(DOCUMENTS_RAW_SCHEMA).parquet(path)


def write_corpus_files(
    out_dir: str,
    n_docs: int,
    seed: int = 42,
    mega_every: int = 50,
    profile: str = "scan",
    jpeg_every: int = 0,
) -> list[tuple[str, str, int]]:
    """Materialize the fixture corpus as one PDF file per document —
    the local stand-in for object storage in locator-mode extraction —
    and return manifest rows (doc_id, pdf_locator, n_pages)."""

    import os

    from ..corpus import iter_corpus

    os.makedirs(out_dir, exist_ok=True)
    rows: list[tuple[str, str, int]] = []
    for d in iter_corpus(n_docs, seed=seed, mega_every=mega_every,
                         profile=profile, jpeg_every=jpeg_every):
        path = os.path.join(out_dir, f"{d['doc_id']}.pdf")
        with open(path, "wb") as fh:
            fh.write(d["pdf_bytes"])
        rows.append((d["doc_id"], path, d["n_pages"]))
    return rows


def locator_dataframe(
    spark: SparkSession, manifest_rows: list[tuple[str, str, int]]
) -> DataFrame:
    """documents_locator (doc_id, pdf_locator, n_pages) from a manifest.
    On a cluster this is a metadata-table read (paths + page counts);
    the PDF bytes never enter the plan — chunk workers fetch their own
    doc's bytes inside the extraction UDF."""

    from .schema import DOCUMENTS_LOCATOR_SCHEMA

    return spark.createDataFrame(manifest_rows, schema=DOCUMENTS_LOCATOR_SCHEMA)
