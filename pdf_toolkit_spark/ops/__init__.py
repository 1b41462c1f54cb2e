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

#: Explicit front of the visit order: queries with NO driver
#: correctness row in any of r01-r04 (late round-4/5 additions), so a
#: budget-truncated harness checks them before re-checking r04 greens.
_NEVER_DRIVER_CHECKED = (
    "curate_domain_quota", "dedup_paragraphs", "text_perplexity_buckets",
    "text_dsir_weight", "text_pii_redact", "text_dup_substring_rate",
    "dedup_minhash_survivors", "dedup_snapshot_diff",
    "sketch_kmv_distinct", "sketch_hll_distinct",
    "sketch_sample_quantiles", "sketch_bloom_semijoin",
    "sketch_cms_heavy_hitters",
    "sim_label_centroids", "sim_ivf_topk_batch",
    "mm_image_thumbnail", "mm_audio_stats", "mm_video_frame_sample",
    "curate_survivors",
)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    front = {n: out[n] for n in _NEVER_DRIVER_CHECKED if n in out}
    front.update({n: f for n, f in out.items() if n not in front})
    return front


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
