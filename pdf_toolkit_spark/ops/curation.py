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
from .common import (
    SQL_HASH32,
    SQL_HASH60,
    SQL_NORM,
    hash32,
    hash60,
    norm_text,
    register_persist,
    table,
)


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


def cluster_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-max canonical pick over the MinHash near-dup clusters:
    for every connected component of the LSH pair graph
    (ops/dedup.py dedup_components), keep the member with the HIGHEST
    quality score (ops/text.py quality_score), not the smallest
    doc_id — what a production dedup pass actually retains, so the
    surviving corpus loses duplicates without losing its best copies.
    Tie-break: quality desc, doc_id asc. Output: (cluster,
    kept_doc_id, best_quality, n_members) — one row per cluster,
    singletons keep themselves with n_members = 1.

    Scale shape: the component labels and quality scalars join on
    doc_id (8 B + one double per doc — text never moves), and the
    per-cluster argmax is max_by over struct(quality, -doc_id) in ONE
    hash aggregate with map-side partial combine: no per-cluster
    window sort, so a mega-cluster (boilerplate that snowballs into
    millions of members) costs its reduce-side row count, not a
    single-reducer sort."""

    cc = _dedup.dedup_components(spark, sf_dir)
    q = _text.quality_score(spark, sf_dir).select("doc_id", "quality")
    return (
        cc.join(q, "doc_id")
        .groupBy(F.col("canonical_id").alias("cluster"))
        .agg(
            F.count("*").alias("n_members"),
            F.max_by(
                F.struct("doc_id", "quality"),
                F.struct(F.col("quality"), -F.col("doc_id")),
            ).alias("best"),
        )
        .select(
            "cluster",
            F.col("best.doc_id").alias("kept_doc_id"),
            F.col("best.quality").alias("best_quality"),
            "n_members",
        )
    )


#: per-domain document cap (the crawl-curation quota): sf0.01 has 25
#: docs per source, so 18 keeps some and drops some in every domain
QUOTA_PER_DOMAIN = 18

#: hash-threshold oversampling factor: a mega-domain's pre-filter
#: keeps ~OVERSAMPLE*K candidates in expectation, so the chance of
#: keeping fewer than K (which the verification pass catches exactly)
#: is Chernoff-negligible
QUOTA_OVERSAMPLE = 4


def _quota_over(docs: DataFrame) -> DataFrame:
    """Exact per-domain top-K by (hash, doc_id) over any (doc_id,
    source) relation — the engine behind :func:`domain_quota`.

    Scale shape (mega-domain-proof): the keyed window never sees a
    domain's full row set. A count pre-pass derives a per-domain hash
    threshold t = ceil(OVERSAMPLE*K/n * 2^32) (keep-all when
    n <= OVERSAMPLE*K); filtering ``h < t`` keeps a PREFIX of each
    domain's (h, doc_id) order — ~OVERSAMPLE*K rows in expectation
    regardless of domain size — so candidate ranks equal domain ranks
    and the window sorts O(K) rows per domain even when one domain is
    most of the corpus. Exactness is verified, not assumed: a domain
    whose candidate count fell below min(n, K) (probability ~2^-40 at
    OVERSAMPLE=4) is re-ranked over its full row set. The candidate
    relation is persisted (two consumers: verification + final rank);
    the tiny per-domain relations broadcast."""

    k_cap = F.lit(QUOTA_PER_DOMAIN)
    keep_all = QUOTA_PER_DOMAIN * QUOTA_OVERSAMPLE
    h = hash32(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")))
    withh = docs.select("doc_id", "source", h.alias("h"))
    counts = withh.groupBy("source").agg(F.count("*").alias("n"))
    thr = counts.select(
        "source",
        "n",
        F.when(F.col("n") <= keep_all, F.lit(1 << 32))
        .otherwise(
            F.ceil(F.lit(float(keep_all) * (1 << 32)) / F.col("n")).cast("bigint")
        )
        .alias("t"),
    )
    cand = register_persist(
        withh.join(F.broadcast(thr), "source")
        .filter(F.col("h") < F.col("t"))
        .select("doc_id", "source", "h")
    )
    bad = [
        r["source"]
        for r in (
            cand.groupBy("source")
            .agg(F.count("*").alias("m"))
            .join(thr, "source", "right")
            .filter(F.coalesce("m", F.lit(0)) < F.least("n", k_cap))
            .select("source")
            .collect()
        )
    ]
    if bad:  # exact fallback for verification failures (~never)
        cand = cand.filter(~F.col("source").isin(bad)).unionByName(
            withh.filter(F.col("source").isin(bad))
        )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QUOTA_PER_DOMAIN)
        .select("doc_id", "source", "rk")
    )


def domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota sampling (crawl curation: cap a domain's
    contribution so no single host dominates the training mix): keep
    at most QUOTA_PER_DOMAIN docs per source, selected by a
    deterministic hash rank (hash32 of 'quota:' + doc_id, doc_id
    tiebreak) — a seedless uniform sample that is stable across runs
    and engines. Output: (doc_id, source, rk) for kept docs.

    Scale shape: see :func:`_quota_over` — a count pre-pass +
    per-domain hash threshold bounds the keyed window at O(K) rows
    per domain (verified-exact), so a mega-domain that is half the
    crawl no longer serializes its full row set through one reducer;
    the plan carries (doc_id, source, 8-byte hash) only, document
    bytes never move."""

    return _quota_over(table(spark, sf_dir, "documents").select("doc_id", "source"))


#: mixture temperature: weight ∝ share^(1/2) — the multilingual-LM
#: standard (temperature sampling with T=2 flattens the head so small
#: domains are not starved)
MIX_SCALE = 1 << 20


def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting (the data-mixing step after
    curation — XLM-R / mT5-style temperature sampling): each domain's
    sampling weight is proportional to the square root of its token
    count, normalized over domains, so high-resource domains are
    down-weighted and the tail still trains. Output: (source, n_docs,
    n_tokens, weight, epochs_at_weight) where epochs_at_weight is the
    implied per-domain repetition factor when sampling a corpus-sized
    budget at these weights.

    Engine-exactness: IEEE sqrt is correctly rounded in BOTH engines
    (unlike log/exp), and the per-domain sqrt is quantized to a 2^20
    integer grid BEFORE the cross-domain sum, so the normalization
    denominator is an exact integer in any aggregation order.

    Scale shape: one map-side-combined (source) aggregate over a
    two-column scan, then arithmetic over #domains rows."""

    docs = table(spark, sf_dir, "documents")
    norm = norm_text(F.col("text"))
    n_tokens = F.when(norm == "", 0).otherwise(F.size(F.split(norm, " ")))
    per = docs.select("source", n_tokens.alias("nt")).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
    )
    q = F.floor(F.sqrt(F.col("n_tokens")) * MIX_SCALE).cast("bigint")
    # persisted: the relation feeds both the totals aggregate and the
    # final projection (no cross-branch subplan sharing in Spark — the
    # scan+tokenize+agg subtree would otherwise run twice)
    quant = register_persist(
        per.select("source", "n_docs", "n_tokens", q.alias("qs"))
    )
    total = quant.agg(
        F.sum("qs").alias("tq"), F.sum("n_tokens").alias("tt")
    )
    w = F.col("qs") / F.col("tq")
    return (
        quant.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(w, 6).alias("weight"),
            # repetitions of this domain when a corpus-sized token
            # budget is drawn at weight w: w * total_tokens / n_tokens.
            # NULL for a zero-token domain in BOTH engines (Spark's
            # non-ANSI divide nulls, DuckDB's would NaN — make the
            # degenerate case explicit instead of engine-divergent).
            F.when(
                F.col("n_tokens") > 0,
                F.round(w * F.col("tt") / F.col("n_tokens"), 6),
            ).alias("epochs_at_weight"),
        )
    )


#: weighted-sample size; sf0.001 has >> 50 docs so the cut is real
WS_K = 50

#: weight cap: docs weigh 1-4 by normalized length (one weight unit
#: per 400 chars) — integer weights keep the sample hash-exact
WS_MAX_W = 4


def ws_candidates(docs: DataFrame) -> DataFrame:
    """(doc_id, source, w, priority) weighted-sample candidates for
    any (doc_id, text, source) relation — the shared engine of the
    batch operator and its streaming twin (identical hash arithmetic
    on both sides keeps stream state merge-equal to the batch cut)."""

    norm = norm_text(F.col("text"))
    w = (
        F.lit(1) + F.least(F.lit(WS_MAX_W - 1), F.floor(F.length(norm) / 400))
    ).cast("int")
    reps = (
        docs.select("doc_id", "source", w.alias("w"))
        .select(
            "doc_id", "source", "w",
            F.explode(F.expr("sequence(0, w - 1)")).alias("i"),
        )
    )
    pr = hash60(
        F.concat(
            F.lit("wsamp:"), F.col("doc_id"), F.lit(":"),
            F.col("i").cast("string"),
        )
    )
    return (
        reps.select("doc_id", "source", "w", pr.alias("p"))
        .groupBy("doc_id", "source", "w")
        .agg(F.min("p").alias("priority"))
    )


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement by hash replication (the
    weighted-MinHash trick, Chum et al.: replicate each doc w times
    with independent hashes and keep the docs with the smallest
    minimum) — the mixture-construction step that draws a fixed-size
    sample favoring longer documents. Weight = 1 + min(3,
    floor(len/400)) over the normalized text; priority = min over w
    md5-derived 60-bit hashes, so P(selected) rises with w, the draw
    is seedless/deterministic, and BOTH engines compute the identical
    integers (no float RNG to drift). Output: the WS_K sampled
    (doc_id, source, w, priority), priority ascending.

    Scale shape: the explode multiplies only (doc_id, source, w, i)
    rows — never text — by <= WS_MAX_W; the min collapses with a
    map-side combine; the final cut is TakeOrdered (per-partition
    top-K then a K-row driver merge), so no global sort and no keyed
    window touch the full corpus."""

    agg = ws_candidates(table(spark, sf_dir, "documents"))
    return agg.orderBy("priority", "doc_id").limit(WS_K)


#: export shard size (bytes of normalized text per shard at this sf;
#: a production run uses ~1 GiB — the layout math is scale-free)
SHARD_BYTES = 4096


def shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic export sharding (the training-data WRITE stage:
    lay the curated corpus out as fixed-byte-budget shards in a stable
    global order so any worker can compute any shard independently):
    each doc gets the exclusive prefix sum of n_chars under doc_id
    order, and its shard is ``floor(prefix / SHARD_BYTES)`` with
    ``offset`` the position inside that shard (docs may straddle a
    boundary; the reader contract is offset-based, WebDataset-style).
    Output: (doc_id, n_chars, shard_id, offset).

    Scale shape: the global cumulative sum is common.prefix_scan —
    range-repartition + per-partition local scans + a
    one-row-per-partition driver merge — NEVER a single-reducer
    ``Window.orderBy`` over the corpus; everything after it is a
    projection. The DuckDB oracle computes the same exclusive prefix
    with a window, so the layout is value-exact."""

    from .common import prefix_scan

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    scanned = prefix_scan(docs, ["doc_id"], "n_chars", "prefix")
    return scanned.select(
        "doc_id",
        "n_chars",
        F.floor(F.col("prefix") / SHARD_BYTES).cast("bigint").alias("shard_id"),
        (F.col("prefix") % SHARD_BYTES).cast("bigint").alias("offset"),
    )


QUERIES = {
    "curate_survivors": curate_survivors,
    "curate_cluster_best": cluster_best,
    "curate_domain_quota": domain_quota,
    "curate_mixture_weights": mixture_weights,
    "curate_weighted_sample": weighted_sample,
    "curate_shard_layout": shard_layout,
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
    "curate_cluster_best": f"""
        WITH ranked AS (
            SELECT cc.canonical_id AS cluster,
                   q.doc_id, q.quality,
                   count(*) OVER (PARTITION BY cc.canonical_id) AS n_members,
                   row_number() OVER (PARTITION BY cc.canonical_id
                       ORDER BY q.quality DESC, q.doc_id ASC) AS rk
            FROM ({_dedup.ORACLES["dedup_components"]}) cc
            JOIN ({_text.ORACLES["text_quality_score"]}) q USING (doc_id)
        )
        SELECT cluster, doc_id AS kept_doc_id, quality AS best_quality,
               n_members
        FROM ranked WHERE rk = 1
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

_CUR_N = SQL_NORM.format(e="text")
_CUR_NT = f"CASE WHEN {_CUR_N} = '' THEN 0 ELSE len(string_split({_CUR_N}, ' ')) END"

ORACLES["curate_weighted_sample"] = f"""
    WITH base AS (
        SELECT doc_id, source,
               CAST(1 + least({WS_MAX_W - 1},
                              floor(len({SQL_NORM.format(e="text")}) / 400))
                    AS INT) AS w
        FROM documents
    ),
    reps AS (
        SELECT doc_id, source, w,
               {SQL_HASH60.format(e="'wsamp:' || doc_id || ':' || g.i")} AS p
        FROM base, generate_series(0, {WS_MAX_W - 1}) AS g(i)
        WHERE g.i < w
    ),
    agg AS (
        SELECT doc_id, source, w, min(p) AS priority
        FROM reps GROUP BY doc_id, source, w
    )
    SELECT doc_id, source, w, priority
    FROM agg ORDER BY priority, doc_id LIMIT {WS_K}
"""

ORACLES["curate_shard_layout"] = f"""
    SELECT doc_id, n_chars,
           CAST(floor(prefix / {SHARD_BYTES}) AS BIGINT) AS shard_id,
           CAST(prefix % {SHARD_BYTES} AS BIGINT) AS offset
    FROM (
        SELECT doc_id, n_chars,
               COALESCE(sum(n_chars) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS prefix
        FROM documents)
"""

ORACLES["curate_mixture_weights"] = f"""
    WITH per AS (
        SELECT source, count(*) AS n_docs,
               CAST(sum({_CUR_NT}) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source
    ),
    quant AS (
        SELECT source, n_docs, n_tokens,
               CAST(floor(sqrt(n_tokens) * {MIX_SCALE}) AS BIGINT) AS qs
        FROM per
    ),
    tot AS (SELECT sum(qs) AS tq, sum(n_tokens) AS tt FROM quant)
    SELECT source, n_docs, n_tokens,
           round(qs / tq, 6) AS weight,
           CASE WHEN n_tokens > 0
                THEN round(qs / tq * tt / n_tokens, 6)
           END AS epochs_at_weight
    FROM quant, tot
"""
