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

from .common import SQL_HASH32, SQL_HASH60, SQL_NORM, hash32, hash60, norm_text, table

N_HASHES = 16
BAND_ROWS = 4  # 4 bands x 4 rows
SIM_BITS = 60
NEARDUP_COS = 0.4


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle): distinct word 3-grams of the normalized text;
    docs with fewer than 3 tokens contribute the whole text."""

    docs = table(spark, sf_dir, "documents")
    norm = norm_text(F.col("text"))
    toks = F.split(norm, " ")
    n = F.when(norm == "", 0).otherwise(F.size(toks))
    grams = F.transform(
        F.sequence(F.lit(1), n - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(toks, i), F.element_at(toks, i + 1), F.element_at(toks, i + 2)
        ),
    )
    shingles = F.when(n >= 3, F.array_distinct(grams)).otherwise(F.array(norm))
    return docs.select("doc_id", F.explode(shingles).alias("shingle"))


def _signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h_idx, sig): MinHash signatures, long format."""

    sh = _shingles(spark, sf_dir)
    salted = sh.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("h_idx"),
        "shingle",
    )
    val = hash32(F.concat_ws(":", F.col("h_idx").cast("string"), F.col("shingle")))
    return (
        salted.select("doc_id", "h_idx", val.alias("hv"))
        .groupBy("doc_id", "h_idx")
        .agg(F.min("hv").alias("sig"))
    )


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

    sigs = _signatures(spark, sf_dir)
    bands = (
        sigs.withColumn("band", F.floor(F.col("h_idx") / BAND_ROWS).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("h_idx", "sig"))),
                        lambda x: x["sig"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_key")
        )
    )
    pairs = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "band_key"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), "h_idx", F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), "h_idx", F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "h_idx"])
        .groupBy("doc_a", "doc_b")
        .agg(F.round(F.avg((F.col("sig_a") == F.col("sig_b")).cast("double")), 6).alias("sim_est"))
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard over shingle sets for pairs sharing any shingle.
    Output: (doc_a, doc_b, jaccard) with jaccard >= 0.2."""

    sh = _shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    ja = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    jb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ja, "doc_a")
        .join(jb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
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


def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine near-dup pairs over ``embeddings``.
    Output: (vec_a, vec_b, cos_sim) with cos_sim >= 0.4. The scalable
    LSH-pruned path is ops/similarity.ann_lsh_topk."""

    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    norm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    e = emb.select("vec_id", "v", norm.alias("nrm"))
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(dot / (F.col("na") * F.col("nb")), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= NEARDUP_COS)
    )


QUERIES = {
    "dedup_exact": exact_dedup,
    "dedup_minhash_signatures": minhash_signatures,
    "dedup_minhash_lsh_pairs": minhash_lsh_pairs,
    "dedup_ngram_jaccard_pairs": ngram_jaccard_pairs,
    "dedup_simhash_bits": simhash_bits,
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

_SQL_SIGS = f"""
    WITH {_SQL_SHINGLES},
    hs AS (SELECT doc_id, unnest(generate_series(0, {N_HASHES - 1})) AS h_idx, shingle FROM sh),
    sigs AS (
        SELECT doc_id, h_idx,
               min({SQL_HASH32.format(e="h_idx::VARCHAR || ':' || shingle")}) AS sig
        FROM hs GROUP BY doc_id, h_idx
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
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            FROM sh a JOIN sh b USING (shingle)
            WHERE a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               round(n_inter / (ja.n_a + jb.n_b - n_inter), 6) AS jaccard
        FROM inter
        JOIN (SELECT doc_id AS doc_a, n_sh AS n_a FROM sizes) ja USING (doc_a)
        JOIN (SELECT doc_id AS doc_b, n_sh AS n_b FROM sizes) jb USING (doc_b)
        WHERE round(n_inter / (ja.n_a + jb.n_b - n_inter), 6) >= 0.2
    """,
    "dedup_simhash_bits": f"""
        WITH base AS (SELECT doc_id, {_N} AS norm FROM documents),
        toks AS (SELECT DISTINCT doc_id, unnest(string_split(norm, ' ')) AS tok FROM base),
        hashed AS (SELECT doc_id, {SQL_HASH60.format(e="tok")} AS h60 FROM toks),
        votes AS (SELECT doc_id, h60, unnest(generate_series(0, {SIM_BITS - 1})) AS bit_idx
                  FROM hashed)
        SELECT doc_id, bit_idx,
               CASE WHEN sum(CASE WHEN (h60 >> bit_idx) & 1 = 1 THEN 1 ELSE -1 END) >= 0
                    THEN 1 ELSE 0 END AS bit
        FROM votes GROUP BY doc_id, bit_idx
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
