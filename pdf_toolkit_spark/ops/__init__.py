"""Large-scale training-data pipeline operators over the testdata
tables: text analysis, deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard), similarity search, and multimodal column plumbing.

Each module exposes
  QUERIES: dict[name, (spark, sf_dir) -> DataFrame]   (Spark-first impl)
  ORACLES: dict[name, str]                            (DuckDB ANSI SQL twin)
and the two must agree column-for-column and value-for-value — the
driver's correctness harness (and tests/test_ops.py) enforce it.
"""

from . import (
    curation,
    dedup,
    extraction_queries,
    html_queries,
    multimodal,
    relational,
    similarity,
    sketches,
    text,
)

_MODULES = (
    relational, text, dedup, similarity, multimodal, sketches, curation,
    extraction_queries, html_queries,
)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
