"""The end-to-end curation pipeline: the composite query a training-data
run actually executes, chaining the per-signal operators this package
provides — C4 quality rules, Gopher repetition rules, GPT-3-style
benchmark decontamination, exact dedup (canonical doc per content
hash), and token accounting — into one survivors relation.

Composition IS the point: every stage is the same doc_id-keyed
relation, so the whole pipeline is a chain of doc_id equi-joins and
the only shuffles are the aggregates the individual operators already
pay for. Each signal pays its own parquet scan, pruned to
(doc_id[, text]) — at extreme scale the scan-count reduction is to
fuse the quality and repetition flag computations into the shared
token-explode pass (they read the same exploded words), trading
operator independence for one fewer read; the decontamination and
dedup signals need their own aggregates either way. The DuckDB oracle
composes the SAME per-stage oracle SQL texts as subqueries, so the
composite stays value-exact by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import dedup as _dedup
from . import text as _text
from .common import SQL_HASH32, hash32, table


def curate_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents that pass ALL curation gates, with their token counts:
    quality keep AND repetition keep AND not benchmark-contaminated
    (benchmark docs themselves are excluded — eval data never trains)
    AND canonical for their exact-content hash. Output: (doc_id,
    n_tokens)."""

    q = _text.quality_filter(spark, sf_dir).filter("keep").select("doc_id")
    r = _text.repetition_filter(spark, sf_dir).filter("keep").select("doc_id")
    dq = (
        _text.decontaminate(spark, sf_dir)
        .filter(~F.col("contaminated"))
        .select("doc_id")
    )
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("fp")
    )
    dd = (
        docs.join(_dedup.exact_dedup(spark, sf_dir), "fp")
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .select("doc_id")
    )
    tok = _text.token_count(spark, sf_dir)
    return (
        q.join(r, "doc_id")
        .join(dq, "doc_id")
        .join(dd, "doc_id")
        .join(tok, "doc_id")
        .select("doc_id", "n_tokens")
    )


#: per-domain document cap (the crawl-curation quota): sf0.01 has 25
#: docs per source, so 18 keeps some and drops some in every domain
QUOTA_PER_DOMAIN = 18


def domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling (crawl curation: cap a domain's
    contribution so no single host dominates the training mix): keep
    at most QUOTA_PER_DOMAIN docs per source, selected by a
    deterministic hash rank (hash32 of 'quota:' + doc_id, doc_id
    tiebreak) — a seedless uniform sample that is stable across runs
    and engines. Output: (doc_id, source, rk) for kept docs.

    Scale shape: ONE window partitioned by the domain key — a keyed
    sort, never a global one; domains shuffle independently and the
    plan carries (doc_id, source, 8-byte hash) only, document bytes
    never move. A pathological mega-domain serializes only its own
    partition; the fix at that scale is a pre-pass count + per-domain
    hash threshold (rank r <= K approximated by h < K/n * 2^32, then
    exact-ranked inside the survivors), which this operator's
    deterministic hash ordering makes drop-in."""

    docs = table(spark, sf_dir, "documents").select("doc_id", "source")
    h = hash32(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.withColumn("h", h)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QUOTA_PER_DOMAIN)
        .select("doc_id", "source", "rk")
    )


QUERIES = {
    "curate_survivors": curate_survivors,
    "curate_domain_quota": domain_quota,
}

ORACLES = {
    "curate_survivors": f"""
        WITH q AS (SELECT doc_id FROM ({_text.ORACLES["text_quality_filter"]}) x
                   WHERE keep),
        r AS (SELECT doc_id FROM ({_text.ORACLES["text_repetition_filter"]}) x
              WHERE keep),
        dq AS (SELECT doc_id FROM ({_text.ORACLES["text_decontaminate"]}) x
               WHERE NOT contaminated),
        dd AS (
            SELECT d.doc_id
            FROM documents d
            JOIN ({_dedup.ORACLES["dedup_exact"]}) e
              ON md5(d.text) = e.fp AND d.doc_id = e.canonical_id
        ),
        tok AS (SELECT * FROM ({_text.ORACLES["text_token_count"]}) x)
        SELECT q.doc_id, tok.n_tokens
        FROM q
        JOIN r USING (doc_id)
        JOIN dq USING (doc_id)
        JOIN dd USING (doc_id)
        JOIN tok USING (doc_id)
    """,
    "curate_domain_quota": f"""
        SELECT doc_id, source, rk FROM (
            SELECT doc_id, source,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY {SQL_HASH32.format(e="'quota:' || doc_id")},
                                doc_id
                   ) AS rk
            FROM documents
        ) t WHERE rk <= {QUOTA_PER_DOMAIN}
    """,
}
