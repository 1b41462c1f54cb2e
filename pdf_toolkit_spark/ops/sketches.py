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

from .common import SQL_HASH32, hash32, register_persist, table

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


# ---------------------------------------------------------------------------
# Bloom-filter semi-join (the 100-TB pattern behind runtime row-group
# skipping / semi-join pushdown) and Count-Min heavy hitters
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 14   #: filter bits
BLOOM_K = 3         #: hash functions
_BLOOM_WORD = 32    #: bits packed per word (sign bit never touched)

CMS_W = 128         #: count-min width (cells per row)
CMS_D = 3           #: count-min depth (independent hash rows)
CMS_TOP = 10


def bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join: BUILDING-segment customers build a
    word-packed Bloom filter (BLOOM_M bits as <=M/32 bigint words, a
    bit_or aggregate); every order then probes WITHOUT shuffling the
    fact table — the probe is BLOOM_K broadcast hash joins on the word
    index plus bit arithmetic, all inside codegen. Output: one row
    (n_build_keys, n_bits_set, n_probe, n_pass_bloom, n_true_match,
    n_false_pos) — pure integers, so the DuckDB twin is exact.

    Scale shape: the filter relation is M/32 rows regardless of build
    cardinality; at 100 TB the fact side is scanned once with zero
    exchanges before the final scalar aggregate (the exact semi-join
    flag rides the same broadcast of build keys). md5-derived positions
    keep both engines bit-identical."""

    cust = table(spark, sf_dir, "customer")
    # persisted: the plan references build 4x and words 4x (K word
    # joins + the truth join + the two stat aggregates), and Spark has
    # no cross-branch subplan sharing — without the pin the customer
    # scan + filter would run once per reference. Both relations are
    # KB-sized (distinct keys / <=M/32 words).
    build = register_persist(
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey").distinct()
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(BLOOM_K)])).alias("j")
    pos = hash32(F.expr("concat('bloom', j, ':', key)")) % BLOOM_M
    positions = (
        build.select(F.col("c_custkey").alias("key"), js)
        .select((pos).alias("pos"))
        .distinct()
    )
    words = register_persist(
        positions.select(
            F.expr(f"pos div {_BLOOM_WORD}").alias("word"),
            F.expr(
                f"shiftleft(cast(1 as bigint), cast(pos % {_BLOOM_WORD} as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )
    probe = table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("key")
    )
    for j in range(BLOOM_K):
        pj = hash32(F.expr(f"concat('bloom', {j}, ':', key)")) % BLOOM_M
        probe = probe.withColumn(f"pos{j}", pj)
        wj = F.broadcast(
            words.select(
                F.col("word").alias(f"word{j}"), F.col("bits").alias(f"bits{j}")
            )
        )
        probe = probe.join(
            wj, F.expr(f"pos{j} div {_BLOOM_WORD}") == F.col(f"word{j}"), "left"
        )
        probe = probe.withColumn(
            f"hit{j}",
            F.expr(
                f"shiftright(coalesce(bits{j}, cast(0 as bigint)),"
                f" cast(pos{j} % {_BLOOM_WORD} as int)) & 1"
            ),
        )
    passed = sum(F.col(f"hit{j}") for j in range(BLOOM_K)) == BLOOM_K
    flagged = probe.join(
        F.broadcast(build.select(F.col("c_custkey").alias("key"),
                                 F.lit(1).alias("in_build"))),
        "key", "left",
    ).select(
        passed.cast("int").alias("pass_bloom"),
        F.coalesce(F.col("in_build"), F.lit(0)).alias("truth"),
    )
    probe_agg = flagged.agg(
        F.count("*").alias("n_probe"),
        F.sum("pass_bloom").alias("n_pass_bloom"),
        F.sum("truth").alias("n_true_match"),
        F.sum(F.expr("pass_bloom * (1 - truth)")).alias("n_false_pos"),
    )
    build_agg = build.agg(F.count("*").alias("n_build_keys"))
    bits_agg = words.agg(
        F.sum(F.expr("bit_count(bits)")).alias("n_bits_set")
    )
    return (
        probe_agg.crossJoin(F.broadcast(build_agg))
        .crossJoin(F.broadcast(bits_agg))
        .select(
            "n_build_keys", "n_bits_set", "n_probe",
            "n_pass_bloom", "n_true_match", "n_false_pos",
        )
    )


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters [Cormode & Muthukrishnan 2005]
    over event user activity: CMS_D md5-derived hash rows x CMS_W
    cells count every event; a user's frequency estimate is the MIN of
    its CMS_D cells, which NEVER undercounts. The exact top-CMS_TOP
    users (count desc, user_id asc) ride along to expose the
    overestimate each collision causes. Output: CMS_TOP rows
    (user_id, exact_cnt, est_cnt, overest), est_cnt >= exact_cnt
    always.

    Scale shape: the sketch is one explode(x D) + map-side-combined
    count into <= D*W cells; the exact branch is the demo/accuracy
    ride-along (at 100 TB you keep the sketch and drop the exact
    groupBy — the point of CMS is that the D*W relation is the whole
    state). Probe = top rows x D joined against the tiny cell
    relation, broadcast both ways."""

    # Repartition ahead of the explode x D md5 pass: the testdata
    # events parquet is a single row group, so the whole sketch build
    # would otherwise hash n_events * CMS_D rows on ONE task.
    ev = table(spark, sf_dir, "events").select("user_id").repartition(
        spark.sparkContext.defaultParallelism
    )
    js = F.explode(F.array(*[F.lit(j) for j in range(CMS_D)])).alias("j")
    cell = hash32(F.expr("concat('cms', j, ':', user_id)")) % CMS_W
    cells = (
        ev.select("user_id", js)
        .select("j", cell.alias("cell"))
        .groupBy("j", "cell")
        .agg(F.count("*").alias("cell_cnt"))
    )
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
        .limit(CMS_TOP)
    )
    probe = top.select("user_id", "exact_cnt", js).withColumn(
        "cell", cell
    )
    est = (
        probe.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("user_id")
        .agg(
            F.max("exact_cnt").alias("exact_cnt"),
            F.min("cell_cnt").alias("est_cnt"),
        )
        .select(
            "user_id", "exact_cnt", "est_cnt",
            (F.col("est_cnt") - F.col("exact_cnt")).alias("overest"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("user_id"))
    )
    return est


QUERIES["sketch_bloom_semijoin"] = bloom_semijoin
QUERIES["sketch_cms_heavy_hitters"] = cms_heavy_hitters

_BPOS = SQL_HASH32.format(
    e="'bloom' || j::VARCHAR || ':' || key::VARCHAR"
) + f" % {BLOOM_M}"

ORACLES["sketch_bloom_semijoin"] = f"""
    WITH build AS (
        SELECT DISTINCT c_custkey AS key FROM customer
        WHERE c_mktsegment = 'BUILDING'
    ),
    jmap AS (SELECT unnest(range({BLOOM_K})) AS j),
    positions AS (
        SELECT DISTINCT {_BPOS} AS pos FROM build CROSS JOIN jmap
    ),
    words AS (
        SELECT pos // {_BLOOM_WORD} AS word,
               bit_or(1::BIGINT << CAST(pos % {_BLOOM_WORD} AS INT)) AS bits
        FROM positions GROUP BY 1
    ),
    probe AS (
        SELECT o_orderkey, o_custkey AS key, {_BPOS} AS pos, j
        FROM orders CROSS JOIN jmap
    ),
    hits AS (
        SELECT p.o_orderkey, p.key,
               CASE WHEN (COALESCE(w.bits, 0) >> CAST(p.pos % {_BLOOM_WORD} AS INT)) & 1 = 1
                    THEN 1 ELSE 0 END AS hit
        FROM probe p LEFT JOIN words w ON p.pos // {_BLOOM_WORD} = w.word
    ),
    perorder AS (
        SELECT o_orderkey, key,
               CASE WHEN sum(hit) = {BLOOM_K} THEN 1 ELSE 0 END AS pass_bloom
        FROM hits GROUP BY 1, 2
    ),
    flagged AS (
        SELECT p.pass_bloom,
               CASE WHEN b.key IS NULL THEN 0 ELSE 1 END AS truth
        FROM perorder p LEFT JOIN build b USING (key)
    )
    SELECT (SELECT count(*) FROM build) AS n_build_keys,
           (SELECT CAST(sum(bit_count(bits)) AS BIGINT) FROM words) AS n_bits_set,
           count(*) AS n_probe,
           CAST(sum(pass_bloom) AS BIGINT) AS n_pass_bloom,
           CAST(sum(truth) AS BIGINT) AS n_true_match,
           CAST(sum(pass_bloom * (1 - truth)) AS BIGINT) AS n_false_pos
    FROM flagged
"""

_CCELL = SQL_HASH32.format(
    e="'cms' || j::VARCHAR || ':' || user_id::VARCHAR"
) + f" % {CMS_W}"

ORACLES["sketch_cms_heavy_hitters"] = f"""
    WITH jmap AS (SELECT unnest(range({CMS_D})) AS j),
    cells AS (
        SELECT j, {_CCELL} AS cell, count(*) AS cell_cnt
        FROM events CROSS JOIN jmap GROUP BY 1, 2
    ),
    top AS (
        SELECT user_id, count(*) AS exact_cnt FROM events
        GROUP BY 1 ORDER BY exact_cnt DESC, user_id ASC LIMIT {CMS_TOP}
    ),
    probe AS (
        SELECT t.user_id, t.exact_cnt, j, {_CCELL} AS cell
        FROM top t CROSS JOIN jmap
    )
    SELECT p.user_id, max(p.exact_cnt) AS exact_cnt,
           min(c.cell_cnt) AS est_cnt,
           min(c.cell_cnt) - max(p.exact_cnt) AS overest
    FROM probe p JOIN cells c USING (j, cell)
    GROUP BY p.user_id
    ORDER BY exact_cnt DESC, user_id ASC
"""


# ---------------------------------------------------------------------------
# KMV theta-sketch set operations (union / intersection / Jaccard)
# ---------------------------------------------------------------------------

#: sketch size for the set-op estimator — small enough that both
#: partitions fill their sketch at every test SF (no partial-sketch
#: branch), large enough for useful accuracy
KMVSET_K = 64


def kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set operations over two customer populations
    (pre-1995 vs 1995+ orderers): per-group KMV sketches combined
    into union / intersection / Jaccard estimates next to their exact
    values — the dataset-overlap primitive (how much does crawl B add
    over crawl A?) that never compares the full key sets. Estimators
    per Beyer et al. 2007 / the DataSketches theta framework:
    theta = min(theta_A, theta_B); hashes below theta form a uniform
    rate-theta sample of the union, so est_inter = |both sketches,
    h < theta| / theta and jaccard = that count over all sampled
    hashes.

    Scale shape: per-group K smallest distinct hashes via a keyed
    row_number window (rank <= K => WindowGroupLimit caps every map
    partition at K rows per group before the exchange); everything
    after operates on <= 2K rows crossed with one broadcast theta
    row. The exact-count branch exists for the oracle's accuracy
    check — it is the full distinct shuffle the sketch avoids at
    100 TB."""

    # persisted: the distinct'd hash relation feeds both the sketch
    # build and the exact-count branch — without the pin the scan and
    # the distinct shuffle would execute twice
    pairs = register_persist(
        table(spark, sf_dir, "orders")
        .select(
            hash32(F.col("o_custkey").cast("string")).alias("h"),
            (F.col("o_orderdate") < "1995-01-01").alias("is_a"),
        )
        .distinct()
    )
    from pyspark.sql import Window

    kmv = register_persist(
        pairs.withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("is_a").orderBy("h")),
        ).filter(F.col("rk") <= KMVSET_K)
    )
    thetas = (
        kmv.groupBy()
        .agg(
            F.max(F.when(F.col("is_a"), F.col("h"))).alias("tha"),
            F.max(F.when(~F.col("is_a"), F.col("h"))).alias("thb"),
        )
    )
    th = F.least(F.col("tha"), F.col("thb"))
    below = (
        kmv.crossJoin(F.broadcast(thetas))
        .filter(F.col("h") < th)
        .groupBy("h")
        .agg(F.count("*").alias("ng"))
        .agg(
            F.count("*").alias("n_below"),
            F.coalesce(
                F.sum(F.when(F.col("ng") == 2, 1).otherwise(0)), F.lit(0)
            ).alias("n_inter"),
        )
    )
    u_kth = (
        kmv.select("h").distinct().orderBy("h").limit(KMVSET_K)
        .agg(F.max("h").alias("thu"))
    )
    exact = (
        pairs.groupBy("h")
        .agg(
            F.max(F.col("is_a").cast("int")).alias("ha"),
            F.max((~F.col("is_a")).cast("int")).alias("hb"),
        )
        .agg(
            F.sum("ha").cast("bigint").alias("exact_a"),
            F.sum("hb").cast("bigint").alias("exact_b"),
            F.count("*").alias("exact_union"),
            F.sum(F.col("ha") * F.col("hb")).cast("bigint").alias("exact_inter"),
        )
    )
    two32 = float(1 << 32)
    est = lambda kth: F.round(F.lit((KMVSET_K - 1) * two32) / kth, 4)  # noqa: E731
    return (
        thetas.crossJoin(below).crossJoin(u_kth).crossJoin(exact)
        .select(
            F.lit(KMVSET_K).alias("k"),
            est(F.col("tha")).alias("est_a"),
            est(F.col("thb")).alias("est_b"),
            est(F.col("thu")).alias("est_union"),
            F.round(F.col("n_inter") * two32 / th, 4).alias("est_inter"),
            F.when(
                F.col("n_below") > 0,
                F.round(F.col("n_inter") / F.col("n_below"), 6),
            ).alias("jaccard_est"),
            "exact_a", "exact_b", "exact_union", "exact_inter",
        )
    )


QUERIES["sketch_kmv_set_ops"] = kmv_set_ops

_HCUST = SQL_HASH32.format(e="o_custkey::VARCHAR")

ORACLES["sketch_kmv_set_ops"] = f"""
    WITH pairs AS (
        SELECT DISTINCT {_HCUST} AS h,
               o_orderdate < DATE '1995-01-01' AS is_a
        FROM orders
    ),
    km AS (
        SELECT h, is_a FROM (
            SELECT h, is_a,
                   row_number() OVER (PARTITION BY is_a ORDER BY h) AS rk
            FROM pairs
        ) t WHERE rk <= {KMVSET_K}
    ),
    th AS (
        SELECT max(CASE WHEN is_a THEN h END) AS tha,
               max(CASE WHEN NOT is_a THEN h END) AS thb
        FROM km
    ),
    below AS (
        SELECT km.h, count(*) AS ng
        FROM km, th WHERE km.h < least(tha, thb) GROUP BY km.h
    ),
    bstats AS (
        SELECT count(*) AS n_below,
               coalesce(sum(CASE WHEN ng = 2 THEN 1 ELSE 0 END), 0) AS n_inter
        FROM below
    ),
    uk AS (
        SELECT max(h) AS thu FROM (
            SELECT DISTINCT h FROM km ORDER BY h LIMIT {KMVSET_K}
        ) u
    ),
    ex AS (
        SELECT CAST(sum(ha) AS BIGINT) AS exact_a,
               CAST(sum(hb) AS BIGINT) AS exact_b,
               count(*) AS exact_union,
               CAST(sum(ha * hb) AS BIGINT) AS exact_inter
        FROM (
            SELECT h, max(CASE WHEN is_a THEN 1 ELSE 0 END) AS ha,
                   max(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS hb
            FROM pairs GROUP BY h
        ) g
    )
    SELECT {KMVSET_K} AS k,
           round({(KMVSET_K - 1)} * 4294967296.0 / tha, 4) AS est_a,
           round({(KMVSET_K - 1)} * 4294967296.0 / thb, 4) AS est_b,
           round({(KMVSET_K - 1)} * 4294967296.0 / thu, 4) AS est_union,
           round(n_inter * 4294967296.0 / least(tha, thb), 4) AS est_inter,
           CASE WHEN n_below > 0
                THEN round(CAST(n_inter AS DOUBLE) / n_below, 6) END
               AS jaccard_est,
           exact_a, exact_b, exact_union, exact_inter
    FROM th, bstats, uk, ex
"""
