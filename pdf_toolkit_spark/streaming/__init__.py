"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10) — these operators are
engine additions for continuous corpora: incremental extraction of
newly landed documents (file-source stream + foreachBatch reusing the
batch pipeline and its anti-join resume), and watermarked event-window
aggregation for the pipeline's operational metrics stream.
"""

from .stream import (
    compact_epochs,
    dedup_process_batch,
    domain_quota_process_batch,
    funnel_stream,
    ivf_assign_process_batch,
    neardup_process_batch,
    pack_process_batch,
    purchase_attribution_stream,
    read_deduped,
    read_ivf_assignments,
    read_neardup_survivors,
    read_packed_sequences,
    read_quota_admitted,
    read_semantic_keep,
    read_tier_assignments,
    read_weighted_sample,
    semantic_dedup_process_batch,
    sessionize_stream,
    stream_dedup_documents,
    stream_domain_quota,
    stream_extraction,
    stream_ivf_assign,
    stream_neardup_documents,
    stream_pack_sequences,
    stream_perplexity_tiers,
    stream_semantic_dedup,
    stream_weighted_sample,
    tier_process_batch,
    weighted_sample_process_batch,
    windowed_event_counts,
)

__all__ = [
    "compact_epochs",
    "dedup_process_batch",
    "domain_quota_process_batch",
    "funnel_stream",
    "ivf_assign_process_batch",
    "neardup_process_batch",
    "pack_process_batch",
    "purchase_attribution_stream",
    "read_deduped",
    "read_ivf_assignments",
    "read_neardup_survivors",
    "read_packed_sequences",
    "read_quota_admitted",
    "read_semantic_keep",
    "read_tier_assignments",
    "read_weighted_sample",
    "semantic_dedup_process_batch",
    "sessionize_stream",
    "stream_dedup_documents",
    "stream_domain_quota",
    "stream_extraction",
    "stream_ivf_assign",
    "stream_neardup_documents",
    "stream_pack_sequences",
    "stream_perplexity_tiers",
    "stream_semantic_dedup",
    "stream_weighted_sample",
    "tier_process_batch",
    "weighted_sample_process_batch",
    "windowed_event_counts",
]
