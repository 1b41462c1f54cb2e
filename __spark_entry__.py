"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``     — flagship: wrap sf0.001 documents into
  deterministic fixture PDFs on the executors and run the full
  distributed extraction pipeline (parse -> rotate -> spread split ->
  crop -> boilerplate strip -> ordered spans).
- ``queries()``        — every implemented operator (SURVEY.md §2 +
  training-data ops), (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``     — exact DuckDB twins for every entry except
  ``extract_spans`` (the extraction pipeline itself is non-SQL; it is
  pinned by the serial-extractor equality gate in tests/test_spark_job
  instead). Capacity parameters (LSH planes, IVF cells, SimHash band
  width) are corpus-derived on BOTH sides — scalar params CTEs in the
  SQL mirror the Python derivations — so the twins stay in lockstep at
  any scale factor.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship extraction on /root/testdata/sf0.001 (rows > 0, stable
    SPANS_SCHEMA: doc_id string, spans array<struct<kind,text,media_ref,offset>>)."""

    from pdf_toolkit_spark.ops.extraction_queries import extract_full_spans

    return extract_full_spans(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pdf_toolkit_spark.ops import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from pdf_toolkit_spark.ops import all_oracles

    return all_oracles()
