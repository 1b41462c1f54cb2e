"""Deduplication operators over ``documents``: exact, MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup.

Spark-first shapes (all built-in functions, no Python):
- exact:     one hash aggregate on md5(text)
- MinHash:   shingle explode -> salted-md5 min per hash index
             (sig_j = min over shingles of hash32(j || ':' || shingle)),
             banded into LSH buckets -> bucket equi-join for candidate
             pairs. At 100 TB the band join is THE scalable primitive:
             shuffle keys are (band, band_key), so near-dups co-locate
             and the cross-doc comparison never goes quadratic.
- SimHash:   distinct-token explode x 60 bit positions -> +/-1 vote sum
- Jaccard:   inverted-index self-join on shared shingles
- embedding: brute-force pair cosine (the LSH-pruned variant lives in
             ops/similarity.py)

hash32/md5 are engine-portable, so every operator has an exact DuckDB
oracle (verified value-for-value in tests/test_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import (
    MINHASH_SALTS,
    SQL_HASH32,
    SQL_HASH60,
    SQL_NORM,
    hash32,
    hash60,
    norm_text,
    table,
)

N_HASHES = 16
BAND_ROWS = 4  # 4 bands x 4 rows
SIM_BITS = 60
NEARDUP_COS = 0.4
MAX_DF = 50  # stop-shingle cap for the Jaccard inverted index


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle): distinct word 3-grams of the normalized text;
    docs with fewer than 3 tokens contribute the whole text."""

    docs = table(spark, sf_dir, "documents")
    # Materialize norm/toks as projected columns FIRST: expressions
    # referenced inside transform() lambdas are re-evaluated per array
    # element, so an inline split() would be recomputed 3x per gram.
    toked = docs.select(
        "doc_id", norm_text(F.col("text")).alias("norm")
    ).select(
        "doc_id", "norm", F.split("norm", " ").alias("toks")
    )
    toks = F.col("toks")
    n = F.when(F.col("norm") == "", 0).otherwise(F.size(toks))
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    shingles = F.when(n >= 3, F.array_distinct(grams)).otherwise(F.array(F.col("norm")))
    sh = toked.select("doc_id", F.explode(shingles).alias("shingle"))
    # The shingle relation feeds several branches (index, df cap, sets,
    # signatures) and Spark does not share subplans across branches —
    # cache it (Spark's CacheManager dedupes by canonicalized plan, so
    # repeated calls reuse one entry).
    return sh.persist()


def _signatures_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig_0..sig_{H-1}): MinHash signatures as ONE hash
    aggregate with H min() expressions — map-side partial aggregation,
    no H-fold row explosion (an explode-then-group formulation would
    shuffle H x the shingle count; this shuffles one row per doc)."""

    sh = _shingles(spark, sf_dir).select("doc_id", hash32(F.col("shingle")).alias("h"))
    aggs = [
        F.min(F.col("h").bitwiseXOR(F.lit(MINHASH_SALTS[j]))).alias(f"sig_{j}")
        for j in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h_idx, sig): MinHash signatures, long format (unpivot
    of the wide aggregate via stack)."""

    wide = _signatures_wide(spark, sf_dir)
    pairs = ", ".join(f"{j}, sig_{j}" for j in range(N_HASHES))
    return wide.selectExpr("doc_id", f"stack({N_HASHES}, {pairs}) AS (h_idx, sig)")


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("fp"))
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _signatures(spark, sf_dir)


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate near-dup pairs via banded LSH + signature-agreement
    estimate. Output: (doc_a, doc_b, sim_est)."""

    wide = _signatures_wide(spark, sf_dir)
    band_keys = [
        F.md5(
            F.concat_ws(",", *[
                F.col(f"sig_{b * BAND_ROWS + r}").cast("string") for r in range(BAND_ROWS)
            ])
        ).alias(f"bk_{b}")
        for b in range(N_HASHES // BAND_ROWS)
    ]
    keyed = wide.select("doc_id", *band_keys)
    stack = ", ".join(f"{b}, bk_{b}" for b in range(N_HASHES // BAND_ROWS))
    bands = keyed.selectExpr(
        "doc_id", f"stack({N_HASHES // BAND_ROWS}, {stack}) AS (band, band_key)"
    )
    # The LSH bucket equi-join: candidates co-locate on (band, band_key)
    # — the primitive that keeps near-dup detection non-quadratic at
    # fleet scale.
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    wa = wide.select(F.col("doc_id").alias("doc_a"),
                     *[F.col(f"sig_{j}").alias(f"a_{j}") for j in range(N_HASHES)])
    wb = wide.select(F.col("doc_id").alias("doc_b"),
                     *[F.col(f"sig_{j}").alias(f"b_{j}") for j in range(N_HASHES)])
    matches = sum(
        (F.col(f"a_{j}") == F.col(f"b_{j}")).cast("double") for j in range(N_HASHES)
    )
    return (
        pairs.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select("doc_a", "doc_b", F.round(matches / N_HASHES, 6).alias("sim_est"))
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard over shingle sets for pairs sharing any shingle.
    Output: (doc_a, doc_b, jaccard) with jaccard >= 0.2."""

    sh = _shingles(spark, sf_dir)
    # Inverted-index candidate generation with a document-frequency cap:
    # shingles in > MAX_DF docs are dropped from the INDEX (not from the
    # Jaccard sets) — the standard guard that keeps the self-join from
    # going quadratic on stop-shingles at corpus scale. A pair is
    # evaluated iff it shares at least one indexable shingle.
    df_ok = (
        sh.groupBy("shingle").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= MAX_DF)
        .select("shingle")
    )
    idx = sh.join(df_ok, "shingle")
    cands = (
        idx.alias("a")
        .join(idx.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Exact Jaccard over the FULL sets, but only for candidate pairs:
    # per-pair array_intersect against collected shingle sets.
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("shs"))
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("shs").alias("shs_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("shs").alias("shs_b"))
    n_inter = F.size(F.array_intersect("shs_a", "shs_b"))
    n_union = F.size("shs_a") + F.size("shs_b") - n_inter
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", F.round(n_inter / n_union, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= 0.2)
    )


def simhash_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash, long format (doc_id, bit_idx, bit): distinct
    tokens vote +/-1 per bit of their 60-bit md5-derived hash."""

    docs = table(spark, sf_dir, "documents")
    norm = norm_text(F.col("text"))
    toks = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(norm, " "))).alias("tok")
    )
    hashed = toks.select("doc_id", hash60(F.col("tok")).alias("h60"))
    long = hashed.select(
        "doc_id", "h60",
        F.explode(F.sequence(F.lit(0), F.lit(SIM_BITS - 1))).alias("bit_idx"),
    )
    vote = F.when(F.expr("(h60 >> bit_idx) & 1") == 1, 1).otherwise(-1)
    return (
        long.groupBy("doc_id", "bit_idx")
        .agg(F.when(F.sum(vote) >= 0, 1).otherwise(0).alias("bit"))
    )


SIM_BAND_BITS = 15  # 60 bits -> 4 bands
SIM_HAMMING_MAX = 20


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup candidates: docs sharing any exact 15-bit band
    of their 60-bit fingerprint, verified by exact Hamming distance.
    Output: (doc_a, doc_b, hamming) with hamming <= SIM_HAMMING_MAX.
    Same LSH-banding shape as MinHash — bucket equi-join, never
    quadratic."""

    bits = simhash_bits(spark, sf_dir)
    bands = (
        bits.groupBy(
            "doc_id", F.floor(F.col("bit_idx") / SIM_BAND_BITS).cast("int").alias("band")
        )
        .agg(F.sum(
            F.col("bit") * F.expr(f"shiftleft(1, CAST(bit_idx % {SIM_BAND_BITS} AS INT))")
        ).alias("band_val"))
    )
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ba = bits.select(F.col("doc_id").alias("doc_a"), "bit_idx", F.col("bit").alias("bit_a"))
    bb = bits.select(F.col("doc_id").alias("doc_b"), "bit_idx", F.col("bit").alias("bit_b"))
    return (
        pairs.join(ba, "doc_a")
        .join(bb, ["doc_b", "bit_idx"])
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.abs(F.col("bit_a") - F.col("bit_b"))).alias("hamming"))
        .filter(F.col("hamming") <= SIM_HAMMING_MAX)
    )


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine near-dup pairs over ``embeddings``.
    Output: (vec_a, vec_b, cos_sim) with cos_sim >= 0.4. The scalable
    LSH-pruned path is ops/similarity.ann_lsh_topk."""

    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # Broadcast-nested-loop with BLAS: one side is broadcast as a dense
    # normalized matrix (vectors fit comfortably — same criterion as a
    # broadcast join side), the other streams through mapInPandas in
    # Arrow batches; cosine = one dgemm per batch. This beats per-pair
    # Catalyst array folds ~50x. Beyond broadcastable scale, candidate
    # generation moves to the LSH buckets (ops/similarity._buckets) and
    # the rerank stays this dgemm, bucket-local.
    side = emb.toPandas()
    ids = side["vec_id"].to_numpy()
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in side["embedding"]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((ids, mat))

    def block(batches):
        b_ids, b_mat = bc.value
        for batch in batches:
            a_ids = batch["vec_id"].to_numpy()
            a = np.stack([np.asarray(v, dtype=np.float64) for v in batch["embedding"]])
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            sims = a @ b_mat.T
            # HALF_UP rounding to match Spark/DuckDB round() semantics
            sims = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            ii, jj = np.nonzero((sims >= NEARDUP_COS) & (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame(
                {"vec_a": a_ids[ii], "vec_b": b_ids[jj], "cos_sim": sims[ii, jj]}
            )

    return emb.mapInPandas(block, "vec_a long, vec_b long, cos_sim double")


QUERIES = {
    "dedup_exact": exact_dedup,
    "dedup_minhash_signatures": minhash_signatures,
    "dedup_minhash_lsh_pairs": minhash_lsh_pairs,
    "dedup_ngram_jaccard_pairs": ngram_jaccard_pairs,
    "dedup_simhash_bits": simhash_bits,
    "dedup_simhash_pairs": simhash_pairs,
    "dedup_embedding_neardup": embedding_neardup_pairs,
}

_N = SQL_NORM.format(e="text")

#: Shared oracle CTEs: normalized tokens and shingles.
_SQL_SHINGLES = f"""
    base AS (SELECT doc_id, {_N} AS norm FROM documents),
    toks AS (SELECT doc_id, norm, string_split(norm, ' ') AS t,
                    CASE WHEN norm = '' THEN 0 ELSE len(string_split(norm, ' ')) END AS n
             FROM base),
    sh AS (
        SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
            FROM (SELECT doc_id, t, unnest(generate_series(1, n-2)) AS i FROM toks WHERE n >= 3)
        )
        UNION ALL
        SELECT doc_id, norm AS shingle FROM toks WHERE n < 3
    )
"""

_SALT_VALUES = ", ".join(f"({j}, {MINHASH_SALTS[j]})" for j in range(N_HASHES))

#: Shared simhash-bits CTE body (spliced into oracles via SIMBITS_PLACEHOLDER).
_SQL_SIMBITS = f"""
    sbase AS (SELECT doc_id, {_N} AS norm FROM documents),
    stoks AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS tok FROM sbase),
    shashed AS (SELECT doc_id, {SQL_HASH60.format(e="tok")} AS h60 FROM stoks),
    svotes AS (SELECT doc_id, h60, unnest(generate_series(0, {SIM_BITS - 1})) AS bit_idx
               FROM shashed),
    simbits AS (
        SELECT doc_id, bit_idx,
               CASE WHEN sum(CASE WHEN (h60 >> bit_idx) & 1 = 1 THEN 1 ELSE -1 END) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM svotes GROUP BY doc_id, bit_idx
    )
"""

_SQL_SIGS = f"""
    WITH {_SQL_SHINGLES},
    hv AS (SELECT doc_id, {SQL_HASH32.format(e="shingle")} AS h FROM sh),
    salts(h_idx, salt) AS (VALUES {_SALT_VALUES}),
    sigs AS (
        SELECT doc_id, h_idx, min(xor(h, salt)) AS sig
        FROM hv, salts GROUP BY doc_id, h_idx
    )
"""

ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS fp, min(doc_id) AS canonical_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "dedup_minhash_signatures": _SQL_SIGS + "SELECT doc_id, h_idx, sig FROM sigs",
    "dedup_minhash_lsh_pairs": _SQL_SIGS + f""",
        bands AS (
            SELECT doc_id, CAST(floor(h_idx / {BAND_ROWS}) AS INT) AS band,
                   md5(string_agg(sig::VARCHAR, ',' ORDER BY h_idx)) AS band_key
            FROM sigs GROUP BY doc_id, band
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b USING (band, band_key)
            WHERE a.doc_id < b.doc_id
        )
        SELECT p.doc_a, p.doc_b,
               round(avg(CASE WHEN sa.sig = sb.sig THEN 1.0 ELSE 0.0 END), 6) AS sim_est
        FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.doc_a
        JOIN sigs sb ON sb.doc_id = p.doc_b AND sb.h_idx = sa.h_idx
        GROUP BY p.doc_a, p.doc_b
    """,
    "dedup_ngram_jaccard_pairs": f"""
        WITH {_SQL_SHINGLES},
        df_ok AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= {MAX_DF}),
        idx AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN df_ok USING (shingle)),
        cands AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM idx a JOIN idx b USING (shingle)
            WHERE a.doc_id < b.doc_id
        ),
        sets AS (SELECT doc_id, list(DISTINCT shingle) AS shs FROM sh GROUP BY doc_id),
        scored AS (
            SELECT doc_a, doc_b,
                   round(len(list_intersect(sa.shs, sb.shs))
                         / (len(sa.shs) + len(sb.shs)
                            - len(list_intersect(sa.shs, sb.shs))), 6) AS jaccard
            FROM cands
            JOIN sets sa ON sa.doc_id = doc_a
            JOIN sets sb ON sb.doc_id = doc_b
        )
        SELECT doc_a, doc_b, jaccard FROM scored WHERE jaccard >= 0.2
    """,
    "dedup_simhash_bits": f"""
        WITH {_SQL_SIMBITS}
        SELECT doc_id, bit_idx, bit FROM simbits
    """,
    "dedup_simhash_pairs": f"""
        WITH {_SQL_SIMBITS},
        bands AS (
            SELECT doc_id, CAST(floor(bit_idx / {SIM_BAND_BITS}) AS INT) AS band,
                   sum(bit * (1 << CAST(bit_idx % {SIM_BAND_BITS} AS INT))) AS band_val
            FROM simbits GROUP BY doc_id, band
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b USING (band, band_val)
            WHERE a.doc_id < b.doc_id
        )
        SELECT p.doc_a, p.doc_b, sum(abs(sa.bit - sb.bit)) AS hamming
        FROM pairs p
        JOIN simbits sa ON sa.doc_id = p.doc_a
        JOIN simbits sb ON sb.doc_id = p.doc_b AND sb.bit_idx = sa.bit_idx
        GROUP BY p.doc_a, p.doc_b
        HAVING sum(abs(sa.bit - sb.bit)) <= {SIM_HAMMING_MAX}
    """,
    "dedup_embedding_neardup": f"""
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
                   AS cos_sim
        FROM embeddings a, embeddings b
        WHERE a.vec_id < b.vec_id
          AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
              >= {NEARDUP_COS}
    """,
}
