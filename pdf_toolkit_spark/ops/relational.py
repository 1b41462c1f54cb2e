"""Relational operators from SURVEY.md §2 expressed over the driver's
TPC-H-ish tables — the engine's aggregate/join/window/explode surface,
each with an exact DuckDB oracle.

Mapping to the reference:
- rel_pricing_summary      A1-style multi-aggregate hash agg (headline)
- rel_status_histogram     A2 action-status histogram (manifest.py:81-88)
- rel_resume_anti_join     P4 skip-if-exists as left-anti join
                           (page_images.py:740-752)
- rel_positional_enum      W1 enumerate() as row_number window
                           (page_images.py:709)
- rel_chunk_explode        C2/_chunk_ranges salting as sequence+explode
                           (split.py:28-42)
- rel_zero_padded_names    O2 deterministic sortable naming
                           (render.py:27-37)
- rel_ratio_filter_agg     F1 aspect-ratio predicate + aggregation
                           (page_images.py:118-123)
- rel_broadcast_join_agg   dimension join (broadcast at scale) + agg
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import prefix_scan, table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (map-side partial
    aggregation + one shuffle on the tiny group key)."""

    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(F.count("*").alias("n_events"))


def resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The checkpoint-resume primitive: docs minus a committed set
    (deterministic stand-in: doc_id % 10 < 3 is 'already done')."""

    docs = table(spark, sf_dir, "documents")
    committed = docs.filter(F.col("doc_id") % 10 < 3).select("doc_id")
    # No broadcast HINT: the committed set is small here (Catalyst
    # size-estimates it under the broadcast threshold and picks a
    # broadcast join on its own) but grows with the corpus — at 10^12
    # committed doc_ids the same plan degrades gracefully to sort-merge
    # instead of OOMing the driver. tests/test_plans.py pins both
    # behaviors.
    return (
        docs.join(committed, "doc_id", "left_anti")
        .select("doc_id", "n_chars")
    )


def positional_enum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """enumerate(files) analog: position of each event within its user's
    timeline (row_number window), plus zero-padded name (O2)."""

    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pos = F.row_number().over(w)
    return ev.select(
        "event_id", "user_id",
        pos.alias("position"),
        F.format_string("p%04d", pos).alias("padded_name"),
    )


def chunk_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_chunk_ranges as a relational op: split each doc's n_chars into
    [start, end] chunks of 1000 (zero-based inclusive)."""

    docs = table(spark, sf_dir, "documents")
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("n_chars") - 1, F.lit(1000)),
        lambda s: F.struct(
            s.alias("chunk_start"),
            F.least(s + 999, F.col("n_chars") - 1).alias("chunk_end"),
        ),
    )
    return (
        docs.filter(F.col("n_chars") > 0)
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", "c.chunk_start", "c.chunk_end")
    )


def zero_padded_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.format_string("doc_p%06d", F.col("doc_id")).alias("name")
    )


def ratio_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio predicate + aggregate (detect_spread analog,
    page_images.py:118-123): line items whose unit price ratio clears a
    threshold, counted per return flag."""

    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_extendedprice") / F.greatest(F.col("l_quantity"), F.lit(1.0)) >= 100.0)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_items"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )


def broadcast_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dim-fact join: revenue by region (nation/region broadcast —
    exactly the join shape AQE turns into a broadcast at scale)."""

    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    orders = table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"),
             F.count("*").alias("n_orders"))
    )


def part_supplier_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: the fact table joined to three broadcast dims
    (part, supplier, nation), profit per nation and brand. Covers the
    two testdata tables (part, supplier) no other query touches."""

    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    supp = table(spark, sf_dir, "supplier")
    nation = table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name", "p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("profit"),
            F.count("*").alias("n_items"),
        )
    )


SESSION_GAP_SEC = 1800


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): events more than
    SESSION_GAP_SEC apart start a new session per user. The batch twin
    of the stateful streaming operator (streaming/stream.py
    sessionize_stream); classic lag + running-sum window pattern."""

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > SESSION_GAP_SEC), 1).otherwise(0)
    with_ids = ev.withColumn(
        "session_id", F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    )
    return (
        with_ids.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


def top_customers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + per-group top-k: rank customers by revenue within
    their region (dims broadcast), keep the top 3."""

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    rev = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy("r_name", "c_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.partitionBy("r_name").orderBy(F.desc("revenue"), F.asc("c_custkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("r_name", "c_custkey", "revenue", "rk")
    )


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: fact-fact join with pushed date predicates,
    revenue per order, deterministic top 10."""

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        orders.filter(F.col("o_orderdate") < "2000-01-01")
        .join(li.filter(F.col("l_shipdate") > "2000-01-01"),
              orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "revenue")
    )


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: order totals by region/nation with ROLLUP
    subtotals and grand total."""

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"),
             F.count("*").alias("n_orders"))
    )


SAMPLE_PER_STRATUM = 20


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: the first SAMPLE_PER_STRATUM
    docs of each (lang, source) stratum in md5-of-id order — the
    engine-portable stand-in for per-stratum reservoir sampling (hash
    order IS a uniform random order, and both engines agree on it).
    At fleet scale this is one window over the stratum shuffle; no
    driver-side sampling state."""

    docs = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_PER_STRATUM)
        .select("doc_id", "lang", "source", F.col("rk").alias("sample_rank"))
    )


#: funnel conversion window: a purchase only converts within 24 h of
#: the user's first qualifying click
FUNNEL_WINDOW_SEC = 86400

#: Q18-shape threshold, sized so the large-order set is small but
#: non-trivial at every sf (sum-quantity p99 at sf0.001 is ~271)
LARGE_ORDER_QTY = 250


def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the events stream (the product-
    analytics staple): first view -> first later click -> purchase
    within 24 h of that click. Output: (stage, n_users), 3 rows.

    Scale shape: three user-keyed hash aggregates chained by user-keyed
    equi-joins — every edge moves one row per user, never the event
    log; the stage histogram is a 3-row rollup."""

    ev = table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("t_click"))
            & (F.unix_timestamp("ts") - F.unix_timestamp("t_click")
               <= FUNNEL_WINDOW_SEC)
        )
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    stages = (
        v.select(F.lit(1).alias("stage"), "user_id")
        .unionByName(c.select(F.lit(2).alias("stage"), "user_id"))
        .unionByName(p.select(F.lit(3).alias("stage"), "user_id"))
    )
    return stages.groupBy("stage").agg(F.count("*").alias("n_users"))


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by the date of their
    first event; for each cohort, distinct active users per week
    offset. Output: (cohort_day, week_offset, n_users).

    Scale shape: one user-keyed first-touch aggregate, a user-keyed
    join back (one row per user on the edge), then a cohort-keyed
    distinct-count — standard two-level rollup, no event-log
    self-join."""

    ev = table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id", "cohort_day",
            F.floor(F.datediff("day", "cohort_day") / 7)
            .cast("int").alias("week_offset"),
        )
        .groupBy("cohort_day", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        # ISO-string cohort label: DATE surfaces as date vs timestamp
        # across Arrow readers; the string is representation-stable
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "week_offset", "n_users",
        )
    )


def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customers LEFT OUTER JOIN orders, orders per
    customer including the zero bucket, then the distribution of those
    counts. Output: (c_count, custdist)."""

    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    per = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose lineitem quantity sum exceeds the
    threshold (HAVING over a fact-table rollup), joined back to orders
    and customers. Output one row per large order."""

    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > LARGE_ORDER_QTY)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_total"), "total_qty",
        )
    )


def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the user's latest
    click at-or-before it (the time-series join Spark lacks as a
    primitive). Output: (event_id, user_id, purchase_ts, click_id,
    click_ts, gap_sec).

    Spark-first formulation: union clicks and purchases into ONE
    relation, a single user-keyed window ordered by (ts, kind) carries
    the running last-click struct forward — one shuffle on user_id,
    no range join, no per-row Python. The DuckDB oracle uses the
    native ASOF JOIN, which pins the semantics exactly."""

    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        # one click per (user, ts): ties would make the as-of match
        # engine-dependent
        .groupBy("user_id", "ts").agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.lit(0).alias("kind"),
                F.lit(None).cast("bigint").alias("event_id"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("bigint").alias("click_id"),
        F.lit(1).alias("kind"), "event_id",
    )
    both = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(F.col("kind") == 0, F.struct("ts", "click_id")),
        ignorenulls=True,
    ).over(w)
    return (
        both.withColumn("lc", last_click)
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("lc.click_id").alias("click_id"),
            F.col("lc.ts").alias("click_ts"),
            (F.unix_timestamp("ts") - F.unix_timestamp("lc.ts"))
            .alias("gap_sec"),
        )
    )


def session_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment (range join): per session from
    rel_sessionization, the number of error events inside its
    [start, end] window. Output: (user_id, session_id, n_events,
    n_errors).

    Scale shape: the range predicate rides a user_id EQUI-join — the
    standard way to make a range join scale on Spark (key the interval
    table and the point table on a shared equi-key so the non-equi
    predicate only filters within matched groups, never a
    BroadcastNestedLoopJoin over the full tables)."""

    sessions = sessionize(spark, sf_dir).alias("s")
    errors = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("user_id", F.col("ts").cast("timestamp").alias("ets"))
        .alias("e")
    )
    # range predicate INSIDE the left join: sessions with only
    # out-of-range errors must keep their row (n_errors = 0)
    joined = sessions.join(
        errors,
        (F.col("s.user_id") == F.col("e.user_id"))
        & (F.col("e.ets") >= F.col("s.session_start"))
        & (F.col("e.ets") <= F.col("s.session_end")),
        "left",
    )
    return (
        joined.groupBy("s.user_id", "s.session_id", "s.n_events")
        .agg(F.count("e.ets").alias("n_errors"))
    )


def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-style LEFT SEMI join — orders having at
    least one lineitem shipped more than 90 days after the order date,
    counted per priority. Output: (o_orderpriority, n_orders)."""

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(F.to_date("o_orderdate"), 90)),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into an
    aggregate + join — revenue from lineitems whose quantity is below
    20% of their part's average quantity. Output: one row
    (avg_yearly_revenue, n_items)."""

    li = table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cut")
    )
    small = li.join(part_avg, "l_partkey").filter(
        F.col("l_quantity") < F.col("qty_cut")
    )
    return small.agg(
        F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly_revenue"),
        F.count("*").alias("n_items"),
    )


def customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family in one pass: per-nation account-balance
    quartile (ntile), percent_rank and cume_dist for every customer.
    Deterministic under ties via the (c_acctbal, c_custkey) ordering.
    Output: (c_custkey, n_name, quartile, pct_rank, cume).

    Scale shape: one window over the nation-keyed exchange — the same
    single-shuffle shape as the engine's positional enumeration."""

    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
    w = Window.partitionBy("n_name").orderBy("c_acctbal", "c_custkey")
    return j.select(
        "c_custkey",
        "n_name",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


#: salt fan-out for the skew-join demonstration
SKEW_SALTS = 8


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join, made explicit: the events fact table has a
    tiny, hot user_id key space (every key is a straggler at scale), so
    the user dimension is replicated across SKEW_SALTS salt values and
    the fact side picks a deterministic salt — each hot key's rows
    spread over 8 reducers instead of one. Result is IDENTICAL to the
    plain join (the oracle is the unsalted SQL); what changes is the
    shuffle key cardinality. This is the manual form of what AQE skew
    handling does for sort-merge joins — spelled out because broadcast
    is not always available (a fleet-scale user dim does not fit) and
    AQE only splits SMJ partitions, not hash-agg hotspots.
    Output: (user_id, event_type, n_events, value_sum, user_rank).

    user_rank (seniority rank by first event) is computed with the
    two-pass prefix scan (common.prefix_scan) — a global
    ``dense_rank().over(Window.orderBy(...))`` would funnel the same
    too-big-to-broadcast dim this query exists to protect through ONE
    reducer. first_event = min(event_id) is unique per user, so
    row_number == dense_rank; the exclusive count of preceding rows
    + 1 IS the rank. Plan pinned SinglePartition-free in test_plans."""

    ev = table(spark, sf_dir, "events")
    dim = (
        ev.groupBy("user_id")
        .agg(F.min("event_id").alias("first_event"))
        .withColumn("__one", F.lit(1))
    )
    dim = (
        prefix_scan(dim, ["first_event"], "__one", "rank0")
        .withColumn("user_rank", (F.col("rank0") + 1).cast("int"))
        .select("user_id", "user_rank")
    )
    salted_dim = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SKEW_SALTS - 1)))
    )
    salted_fact = ev.withColumn("salt", (F.col("event_id") % SKEW_SALTS).cast("int"))
    return (
        salted_fact.join(salted_dim, ["user_id", "salt"])
        .groupBy("user_id", "event_type", "user_rank")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select("user_id", "event_type", "n_events", "value_sum", "user_rank")
    )


def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (completes the family next to rel_rollup_
    sales): order totals by every subset of {region, priority}."""

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
    )
    return (
        joined.cube("r_name", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total"),
             F.count("*").alias("n_orders"))
    )


def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions (semi-structured payload columns, the one
    function family the inventory lacked): extract props.k from the
    events JSON column, bucket it, and aggregate. Output: (event_type,
    k_bucket, n_events, k_sum). The extraction stays in whole-stage
    codegen (get_json_object), no UDF."""

    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(
            "event_type",
            F.floor(F.col("k") / 10).cast("int").alias("k_bucket"),
        )
        .agg(F.count("*").alias("n_events"), F.sum("k").alias("k_sum"))
    )


#: pivot columns are DECLARED, not discovered: at fleet scale an
#: undeclared pivot triggers a distinct-scan of the pivot key before
#: the real aggregation
PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_events_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational transposition (the pivot family): per user, one
    column per event type with its count — the wide feature matrix a
    downstream model join consumes. Output: (user_id, click, error,
    purchase, signup, view)."""

    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", list(PIVOT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(PIVOT_TYPES))
    )


QUERIES = {
    "rel_pivot_events_by_user": pivot_events_by_user,
    "rel_json_props_rollup": json_props_rollup,
    "rel_cube_sales": cube_sales,
    "rel_skew_salted_join": skew_salted_join,
    "rel_customer_quartiles": customer_quartiles,
    "rel_late_order_priority": late_order_priority,
    "rel_small_quantity_revenue": small_quantity_revenue,
    "rel_asof_join": asof_join,
    "rel_session_range_join": session_range_join,
    "rel_funnel": funnel,
    "rel_retention_cohorts": retention_cohorts,
    "rel_order_count_distribution": order_count_distribution,
    "rel_large_orders": large_orders,
    "rel_sessionization": sessionize,
    "rel_stratified_sample": stratified_sample,
    "rel_top_customers_per_region": top_customers_per_region,
    "rel_shipping_priority": shipping_priority,
    "rel_rollup_sales": rollup_sales,
    "rel_pricing_summary": pricing_summary,
    "rel_status_histogram": status_histogram,
    "rel_resume_anti_join": resume_anti_join,
    "rel_positional_enum": positional_enum,
    "rel_chunk_explode": chunk_explode,
    "rel_zero_padded_names": zero_padded_names,
    "rel_ratio_filter_agg": ratio_filter_agg,
    "rel_broadcast_join_agg": broadcast_join_agg,
    "rel_part_supplier_profit": part_supplier_profit,
}

#: the sessionization query as a reusable SQL body (also the base
#: relation of the rel_session_range_join oracle)
_SESSIONIZE_SQL = f"""
        WITH marked AS (
            SELECT user_id, ts::TIMESTAMP AS ts, event_id, value,
                   CASE WHEN epoch(ts::TIMESTAMP)
                             - epoch(lag(ts::TIMESTAMP) OVER
                                     (PARTITION BY user_id ORDER BY ts, event_id))
                             > {SESSION_GAP_SEC}
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        ids AS (
            SELECT user_id, ts, value,
                   -- BIGINT cast: DuckDB's sum() yields HUGEINT -> float in
                   -- Arrow output; Spark emits bigint. Values are identical,
                   -- the cast keeps the driver's value-hash in agreement.
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
            FROM marked
        )
        SELECT user_id, session_id,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS value_sum
        FROM ids GROUP BY user_id, session_id
"""


ORACLES = {
    "rel_pivot_events_by_user": """
        SELECT user_id,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   ::BIGINT AS click,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   ::BIGINT AS error,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   ::BIGINT AS purchase,
               sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                   ::BIGINT AS signup,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   ::BIGINT AS view
        FROM events GROUP BY user_id
    """,
    "rel_json_props_rollup": """
        SELECT event_type,
               CAST(CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS INT)
                   AS k_bucket,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                   AS k_sum
        FROM events
        WHERE json_extract(props, '$.k') IS NOT NULL
        GROUP BY event_type, k_bucket
    """,
    "rel_cube_sales": """
        SELECT r_name, o_orderpriority,
               round(sum(o_totalprice), 2) AS total,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY CUBE (r_name, o_orderpriority)
    """,
    "rel_skew_salted_join": """
        WITH dim AS (
            SELECT user_id,
                   CAST(dense_rank() OVER (ORDER BY first_event) AS INT)
                       AS user_rank
            FROM (SELECT user_id, min(event_id) AS first_event
                  FROM events GROUP BY user_id)
        )
        SELECT e.user_id, e.event_type,
               count(*) AS n_events,
               round(sum(e.value), 2) AS value_sum,
               d.user_rank
        FROM events e JOIN dim d ON e.user_id = d.user_id
        GROUP BY e.user_id, e.event_type, d.user_rank
    """,
    "rel_customer_quartiles": """
        SELECT c_custkey, n_name,
               CAST(ntile(4) OVER w AS INT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal, c_custkey)
    """,
    "rel_late_order_priority": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate::DATE > o.o_orderdate::DATE + INTERVAL 90 DAY
        )
        GROUP BY o_orderpriority
    """,
    "rel_small_quantity_revenue": """
        WITH pa AS (
            SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut
            FROM lineitem GROUP BY l_partkey
        )
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly_revenue,
               count(*) AS n_items
        FROM lineitem JOIN pa USING (l_partkey)
        WHERE l_quantity < qty_cut
    """,
    "rel_funnel": f"""
        WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                   WHERE event_type = 'view' GROUP BY user_id),
        c AS (SELECT e.user_id, min(ts) AS t_click
              FROM events e JOIN v USING (user_id)
              WHERE event_type = 'click' AND ts > t_view
              GROUP BY e.user_id),
        p AS (SELECT e.user_id, min(ts) AS t_purchase
              FROM events e JOIN c USING (user_id)
              -- floor(epoch()) on BOTH ends: the Spark side uses
              -- unix_timestamp() (whole-second floor), so a purchase in
              -- the boundary second of the window must classify the
              -- same way in both engines (same trick as rel_asof_join)
              WHERE event_type = 'purchase' AND ts > t_click
                AND floor(epoch(ts)) - floor(epoch(t_click))
                    <= {FUNNEL_WINDOW_SEC}
              GROUP BY e.user_id),
        stages AS (
            SELECT 1 AS stage, user_id FROM v
            UNION ALL SELECT 2, user_id FROM c
            UNION ALL SELECT 3, user_id FROM p
        )
        SELECT stage, count(*) AS n_users FROM stages GROUP BY stage
    """,
    "rel_retention_cohorts": """
        WITH ev AS (SELECT user_id, ts::DATE AS day FROM events),
        first AS (SELECT user_id, min(day) AS cohort_day
                  FROM ev GROUP BY user_id)
        SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
               week_offset, n_users
        FROM (
            SELECT cohort_day,
                   CAST(floor(date_diff('day', cohort_day, day) / 7.0) AS INT)
                       AS week_offset,
                   count(DISTINCT user_id) AS n_users
            FROM ev JOIN first USING (user_id)
            GROUP BY cohort_day, week_offset
        )
    """,
    "rel_order_count_distribution": """
        WITH per AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist FROM per GROUP BY c_count
    """,
    "rel_large_orders": f"""
        WITH big AS (
            SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING total_qty > {LARGE_ORDER_QTY}
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               round(o_totalprice, 2) AS o_total, total_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "rel_stratified_sample": f"""
        SELECT doc_id, lang, source, sample_rank FROM (
            SELECT doc_id, lang, source,
                   CAST(row_number() OVER (
                       PARTITION BY lang, source
                       ORDER BY md5(doc_id::VARCHAR), doc_id) AS INT) AS sample_rank
            FROM documents
        ) WHERE sample_rank <= {SAMPLE_PER_STRATUM}
    """,
    "rel_sessionization": _SESSIONIZE_SQL,
    "rel_asof_join": f"""
        WITH p AS (SELECT event_id, user_id, ts FROM events
                   WHERE event_type = 'purchase'),
        c AS (SELECT user_id, ts, max(event_id) AS click_id
              FROM events WHERE event_type = 'click'
              GROUP BY user_id, ts)
        SELECT p.event_id, p.user_id,
               p.ts AS purchase_ts, c.click_id, c.ts AS click_ts,
               CAST(floor(epoch(p.ts)) AS BIGINT)
               - CAST(floor(epoch(c.ts)) AS BIGINT) AS gap_sec
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "rel_session_range_join": f"""
        WITH sessions AS ({{sess}}),
        errors AS (SELECT user_id, ts::TIMESTAMP AS ets FROM events
                   WHERE event_type = 'error')
        SELECT s.user_id, s.session_id, s.n_events,
               count(e.ets) AS n_errors
        FROM sessions s LEFT JOIN errors e
          ON s.user_id = e.user_id
         AND e.ets >= s.session_start AND e.ets <= s.session_end
        GROUP BY s.user_id, s.session_id, s.n_events
    """.format(sess=_SESSIONIZE_SQL),
    "rel_top_customers_per_region": """
        WITH rev AS (
            SELECT r_name, c_custkey, round(sum(o_totalprice), 2) AS revenue
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, c_custkey
        )
        SELECT r_name, c_custkey, revenue, rk FROM (
            SELECT *, row_number() OVER (
                PARTITION BY r_name ORDER BY revenue DESC, c_custkey ASC) AS rk
            FROM rev
        ) WHERE rk <= 3
    """,
    "rel_shipping_priority": """
        SELECT o_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate < '2000-01-01' AND l_shipdate > '2000-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "rel_rollup_sales": """
        SELECT r_name, n_name, round(sum(o_totalprice), 2) AS total,
               count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
    """,
    "rel_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "rel_status_histogram": "SELECT event_type, count(*) AS n_events FROM events GROUP BY event_type",
    "rel_resume_anti_join": """
        SELECT doc_id, n_chars FROM documents d
        WHERE NOT EXISTS (
            SELECT 1 FROM documents c WHERE c.doc_id % 10 < 3 AND c.doc_id = d.doc_id
        )
    """,
    "rel_positional_enum": """
        SELECT event_id, user_id,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS position,
               printf('p%04d', row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   AS padded_name
        FROM events
    """,
    "rel_chunk_explode": """
        SELECT doc_id, s AS chunk_start, least(s + 999, n_chars - 1) AS chunk_end
        FROM (SELECT doc_id, n_chars, unnest(generate_series(0, n_chars - 1, 1000)) AS s
              FROM documents WHERE n_chars > 0)
    """,
    "rel_zero_padded_names": "SELECT doc_id, printf('doc_p%06d', doc_id) AS name FROM documents",
    "rel_ratio_filter_agg": """
        SELECT l_returnflag, count(*) AS n_items, round(sum(l_extendedprice), 2) AS total
        FROM lineitem
        WHERE l_extendedprice / greatest(l_quantity, 1.0) >= 100.0
        GROUP BY l_returnflag
    """,
    "rel_broadcast_join_agg": """
        SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "rel_part_supplier_profit": """
        SELECT n_name, p_brand,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS profit,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, p_brand
    """,
}
