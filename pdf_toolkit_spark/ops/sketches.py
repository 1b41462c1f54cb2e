"""Distinct-count sketches over the testdata tables — the cardinality
estimators a 100 TB pipeline runs instead of exact COUNT(DISTINCT).

Both sketches are built on the engine's cross-engine hash primitive
(hash32 = first 32 md5 bits, ops/common.py), which makes them fully
DETERMINISTIC and therefore oracle-checkable value-for-value against
DuckDB — unlike the built-in approx_count_distinct/approx_percentile
whose sketch internals differ per engine. The estimators themselves
are the published ones:

- KMV (k minimum values): keep the K smallest distinct hash values;
  est = (K-1) / (kth_min / 2^32)  [Bar-Yossef et al. 2002].
- HyperLogLog: m=2^P registers, register = max rank of the leftmost
  1-bit of the hash remainder; harmonic-mean estimate
  alpha_m * m^2 / sum(2^-reg)  [Flajolet et al. 2007]. The raw
  harmonic estimate is reported without the small-range/ln correction:
  2^-reg sums are exact dyadic rationals (bit-identical in any
  partition order and engine), while ln() would differ in the last
  ulp between libms. n_zero_registers is emitted so a consumer can
  apply the correction downstream.

Scale shape: both are one hash-aggregate pass. The HLL rollup is
register-bounded (m rows through the final shuffle); KMV's min-K is a
TakeOrdered (per-partition top-K, then a single merge) over the
distinct-hash relation. Each query also reports the exact distinct
count next to its estimate — that branch exists for the oracle's
accuracy check and is the COST the sketch avoids at 100 TB; drop it
(and its distinct shuffle) in production use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .common import SQL_HASH32, hash32, table

KMV_K = 256

#: HLL precision: P index bits -> m = 2^P registers; ranks run over the
#: remaining 32 - P bits.
HLL_P = 10
HLL_M = 1 << HLL_P
#: alpha_m for m >= 128 (Flajolet et al. Fig. 3), emitted as the same
#: decimal literal into both engines
HLL_ALPHA = round(0.7213 / (1 + 1.079 / HLL_M), 10)

#: the sketched key: (l_partkey, l_suppkey) pairs — a genuinely
#: high-cardinality composite on the biggest table
_KEY = "l_partkey || '|' || l_suppkey"


def _hashes(spark: SparkSession, sf_dir: str):
    li = table(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", F.col("l_partkey"), F.col("l_suppkey"))
    return li.select(hash32(key).alias("h"))


def kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count estimate vs the exact count. Output: one row
    (k, kth_min, est_distinct, exact_distinct, rel_err)."""

    kth = (
        _hashes(spark, sf_dir).distinct().orderBy("h").limit(KMV_K)
        .agg(F.max("h").alias("kth_min"), F.count("*").alias("k_seen"))
    )
    exact = _hashes(spark, sf_dir).agg(
        F.countDistinct("h").alias("exact_distinct")
    )
    est = F.when(
        F.col("k_seen") < KMV_K, F.col("exact_distinct").cast("double")
    ).otherwise((KMV_K - 1) / (F.col("kth_min") / F.lit(float(1 << 32))))
    return (
        kth.crossJoin(exact)
        .select(
            F.lit(KMV_K).alias("k"),
            "kth_min",
            F.round(est, 4).alias("est_distinct"),
            "exact_distinct",
            F.round(
                F.abs(est - F.col("exact_distinct")) / F.col("exact_distinct"),
                6,
            ).alias("rel_err"),
        )
    )


def hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog: md5-derived register maxima, raw
    harmonic estimate (exact dyadic sum, no ln small-range branch).
    Output: one row (m, n_zero_registers, harmonic_sum, est_distinct,
    exact_distinct)."""

    hashes = _hashes(spark, sf_dir)
    rem_bits = 32 - HLL_P
    bucket = (F.col("h") / (1 << rem_bits)).cast("bigint")
    z = F.col("h") % (1 << rem_bits)
    # rank of the leftmost 1-bit in the remainder: bin() length is
    # floor(log2)+1 computed in integer space — no float log anywhere
    rho = F.when(z == 0, rem_bits + 1).otherwise(
        rem_bits + 1 - F.length(F.bin(z))
    )
    regs = (
        hashes.select(bucket.alias("b"), rho.alias("rho"))
        .groupBy("b")
        .agg(F.max("rho").alias("reg"))
    )
    # sum of 2^-reg over present registers; absent registers (never
    # hit) contribute 2^0 each
    agg = regs.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_present"),
        F.count("*").alias("n_regs"),
    )
    exact = _hashes(spark, sf_dir).distinct().agg(
        F.count("*").alias("exact_distinct")
    )
    s = F.col("s_present") + (HLL_M - F.col("n_regs"))
    return (
        agg.crossJoin(exact)
        .select(
            F.lit(HLL_M).alias("m"),
            (HLL_M - F.col("n_regs")).cast("bigint").alias("n_zero_registers"),
            F.round(s, 6).alias("harmonic_sum"),
            F.round(F.lit(HLL_ALPHA) * HLL_M * HLL_M / s, 4).alias(
                "est_distinct"
            ),
            "exact_distinct",
        )
    )


SAMPLE_K = 1024
#: quantiles as EXACT rationals (num, den): the discrete rank is
#: ceil(p*n) computed in pure integer arithmetic — (num*n + den-1) div
#: den — because float ceil(0.9 * n) differs between Spark (double) and
#: DuckDB (DECIMAL) exactly when p*n is integral (n=10, p=0.9 -> 10.0
#: vs DECIMAL 9.0's ceil 9).
_QPS = ((50, 1, 2), (90, 9, 10), (99, 99, 100))


def sample_quantiles(
    spark: SparkSession, sf_dir: str, include_exact: bool = False
) -> DataFrame:
    """Quantile estimation from a deterministic uniform sample: the
    SAMPLE_K orders with the smallest md5-derived key hashes (hash
    order IS a uniform random order, and both engines agree on it)
    estimate the o_totalprice quantiles. Ties in the 32-bit hash are
    broken by o_orderkey in BOTH engines — collisions among ~hundreds
    of thousands of keys are birthday-expected, and an untied LIMIT
    straddling a tie would make the sample run-nondeterministic.
    Output: one row (sample_k, q_est_50, q_est_90, q_est_99).

    Scale shape: the sample is a TakeOrdered over (hash32, key)
    (map-side top-K); its quantiles sort SAMPLE_K rows. No full-table
    sort anywhere — that is the cost the sketch avoids at 100 TB.

    ``include_exact=True`` (tests/accuracy harness only — NOT the
    shipped query) appends q_exact_* columns computed by a full global
    sort of orders."""

    from pyspark.sql import Window

    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("v")
    )

    def disc_quantiles(df, prefix):
        w = Window.orderBy("v", "o_orderkey")
        ranked = df.select(
            "v",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("n"),
        )
        aggs = [
            F.max(
                F.when(
                    F.col("rn")
                    == F.expr(f"({num} * n + {den - 1}) div {den}"),
                    F.col("v"),
                )
            ).alias(f"{prefix}{pct}")
            for pct, num, den in _QPS
        ]
        return ranked.agg(*aggs)

    sample = (
        orders.withColumn("h", hash32(F.col("o_orderkey").cast("string")))
        .orderBy("h", "o_orderkey")
        .limit(SAMPLE_K)
        .select("o_orderkey", "v")
    )
    est = disc_quantiles(sample, "q_est_")
    if not include_exact:
        return est.select(F.lit(SAMPLE_K).alias("sample_k"), "*")
    exact = disc_quantiles(orders, "q_exact_")
    return (
        est.crossJoin(exact)
        .select(F.lit(SAMPLE_K).alias("sample_k"), "*")
    )


QUERIES = {
    "sketch_kmv_distinct": kmv_distinct,
    "sketch_hll_distinct": hll_distinct,
    "sketch_sample_quantiles": sample_quantiles,
}

_H = SQL_HASH32.format(e=_KEY)

ORACLES = {
    "sketch_kmv_distinct": f"""
        WITH hashes AS (SELECT DISTINCT {_H} AS h FROM lineitem),
        kth AS (
            SELECT max(h) AS kth_min, count(*) AS k_seen
            FROM (SELECT h FROM hashes ORDER BY h LIMIT {KMV_K})
        ),
        ex AS (SELECT count(*) AS exact_distinct FROM hashes)
        SELECT {KMV_K} AS k, kth_min,
               round(CASE WHEN k_seen < {KMV_K}
                          THEN exact_distinct::DOUBLE
                          ELSE ({KMV_K} - 1) / (kth_min / 4294967296.0)
                     END, 4) AS est_distinct,
               exact_distinct,
               round(abs(CASE WHEN k_seen < {KMV_K}
                              THEN exact_distinct::DOUBLE
                              ELSE ({KMV_K} - 1) / (kth_min / 4294967296.0)
                         END - exact_distinct) / exact_distinct, 6)
                   AS rel_err
        FROM kth CROSS JOIN ex
    """,
    "sketch_hll_distinct": f"""
        WITH hashes AS (SELECT {_H} AS h FROM lineitem),
        br AS (
            SELECT CAST(h // {1 << (32 - HLL_P)} AS BIGINT) AS b,
                   CASE WHEN h % {1 << (32 - HLL_P)} = 0
                        THEN {32 - HLL_P + 1}
                        ELSE {32 - HLL_P + 1}
                             - length(bin(h % {1 << (32 - HLL_P)}))
                   END AS rho
            FROM hashes
        ),
        regs AS (SELECT b, max(rho) AS reg FROM br GROUP BY b),
        agg AS (
            SELECT sum(power(2.0, -reg)) AS s_present,
                   count(*) AS n_regs
            FROM regs
        ),
        ex AS (SELECT count(DISTINCT h) AS exact_distinct FROM hashes)
        SELECT {HLL_M} AS m,
               CAST({HLL_M} - n_regs AS BIGINT) AS n_zero_registers,
               round(s_present + ({HLL_M} - n_regs), 6) AS harmonic_sum,
               round({HLL_ALPHA} * {HLL_M} * {HLL_M}
                     / (s_present + ({HLL_M} - n_regs)), 4) AS est_distinct,
               exact_distinct
        FROM agg CROSS JOIN ex
    """,
}

_HQ = SQL_HASH32.format(e="o_orderkey::VARCHAR")

def _rank(num: int, den: int) -> str:
    """ceil(num/den * n) in pure integer arithmetic — identical in
    both engines (float ceil diverges when p*n is integral)."""

    return f"(({num} * n + {den - 1}) // {den})"


_Q_EST = ",\n               ".join(
    f"max(CASE WHEN rn = {_rank(num, den)} THEN v END) AS q_est_{pct}"
    for pct, num, den in _QPS
)
_Q_EXACT = ",\n               ".join(
    f"max(CASE WHEN rn = {_rank(num, den)} THEN v END) AS q_exact_{pct}"
    for pct, num, den in _QPS
)

ORACLES["sketch_sample_quantiles"] = f"""
    WITH o AS (SELECT o_orderkey, round(o_totalprice, 2) AS v FROM orders),
    sample AS (
        SELECT o_orderkey, v
        FROM (SELECT o_orderkey, v, {_HQ} AS h FROM o
              ORDER BY h, o_orderkey LIMIT {SAMPLE_K})
    ),
    rs AS (
        SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM sample
    ),
    qe AS (
        SELECT {_Q_EST}
        FROM rs
    )
    SELECT {SAMPLE_K} AS sample_k, qe.* FROM qe
"""

#: exact-quantile twin for sample_quantiles(include_exact=True) — used
#: only by tests/the accuracy harness (the full sort of orders is the
#: cost the shipped sketch avoids).
SAMPLE_QUANTILES_EXACT_SQL = f"""
    WITH o AS (SELECT o_orderkey, round(o_totalprice, 2) AS v FROM orders),
    sample AS (
        SELECT o_orderkey, v
        FROM (SELECT o_orderkey, v, {_HQ} AS h FROM o
              ORDER BY h, o_orderkey LIMIT {SAMPLE_K})
    ),
    rs AS (
        SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM sample
    ),
    re AS (
        SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM o
    ),
    qe AS (
        SELECT {_Q_EST}
        FROM rs
    ),
    qx AS (
        SELECT {_Q_EXACT}
        FROM re
    )
    SELECT {SAMPLE_K} AS sample_k, qe.*, qx.* FROM qe CROSS JOIN qx
"""
