"""General relational query surface over the star schema (SURVEY.md §2.1):
joins of every flavor, full aggregation surface, window functions,
sorts/top-k, set ops, and the scalar function families. These generalize
the reference's operator classes (B6/J1 → joins, A1/A2 → aggs, A3 → window
functions, C2/C3 → datetime) to the query surface a user of a general
engine needs.

Plan posture per query is noted in its docstring: what shuffles, what
broadcasts, what pushes down. Dims (region/nation/supplier) are always
broadcast; fact-fact joins shuffle on their keys and rely on AQE for
skew. Floats: aggregate in decimal where exactness matters, round once
at the end, never round exact-decimal scalars at tie digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load
from .registry import query


# --- TPC-H-style analytics -----------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                     AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, zero joins. Filter pushes
    to parquet; one partial+final hash agg = one shuffle of ~6 rows.
    Monetary sums go through DECIMAL so the result is order-independent
    and bit-identical to the oracle regardless of partitioning."""
    li = load(spark, sf_dir, "lineitem")
    d = lambda c, s: F.col(c).cast(f"decimal(18,{s})")  # noqa: E731
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(d("l_quantity", 2)).cast("double").alias("sum_qty"),
            F.sum(d("l_extendedprice", 2)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two equi-joins → agg →
    global top-10. customer filter prunes early (predicate pushdown);
    orders⋈lineitem shuffles on orderkey; the final top-10 is a
    TakeOrderedAndProject, not a full sort. Deterministic tiebreak on
    orderkey."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    l = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
SELECT n.n_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. region/nation/supplier are broadcast
    (dims); the fact-fact joins shuffle on orderkey. Catalyst reorders
    the dim filters below the joins."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(l, l["l_orderkey"] == o["o_orderkey"])
        .join(
            F.broadcast(s),
            (l["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


# --- join flavors ---------------------------------------------------------


@query(
    "join_left_outer_enrich",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice,
       COALESCE(n.n_name, 'UNKNOWN') AS nation_name
FROM orders o
LEFT JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_acctbal > 5000
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderstatus = 'O'
""",
)
def join_left_outer_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer enrichment chain with default on miss — J1 generalized
    (``/root/reference/src/utils.rs:83-87``). Nation broadcast."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, c["c_custkey"] == o["o_custkey"], "left")
        .join(F.broadcast(n), n["n_nationkey"] == c["c_nationkey"], "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation_name"),
        )
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 490000)
""",
)
def join_anti_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers that never placed a jumbo (>490k)
    order. (The price predicate keeps the result non-degenerate — every
    customer has *some* order in this data.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 490000)
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_semi_parts_ordered",
    oracle="""
SELECT p.p_partkey, p.p_name, p.p_retailprice
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 45)
""",
)
def join_semi_parts_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join — B6 generalized (``scanner.rs:175-178``)."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 45)
    return p.join(l, p["p_partkey"] == l["l_partkey"], "left_semi").select(
        "p_partkey", "p_name", "p_retailprice"
    )


@query(
    "join_full_outer_nation_activity",
    oracle="""
WITH cust_n AS (
    SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer GROUP BY c_nationkey
),
supp_n AS (
    SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
    FROM supplier GROUP BY s_nationkey
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM cust_n c FULL OUTER JOIN supp_n s ON c.nationkey = s.nationkey
""",
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two aggregates (nations with customers and/or
    suppliers)."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        c.join(s, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@query(
    "join_range_events_orders",
    oracle="""
SELECT o.o_orderkey, CAST(COUNT(*) AS BIGINT) AS n_cheaper_parts
FROM orders o JOIN part p
  ON p.p_retailprice * 100 <= o.o_totalprice AND p.p_size >= 48
WHERE o.o_orderkey < 100
GROUP BY o.o_orderkey
""",
)
def join_range_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (non-equi): broadcast the filtered small side so
    the BNLJ never shuffles the big side. Generalizes A3's ordered
    comparisons to join predicates."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100)
    p = load(spark, sf_dir, "part").filter(F.col("p_size") >= 48)
    return (
        o.join(
            F.broadcast(p), p["p_retailprice"] * 100 <= o["o_totalprice"]
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_cheaper_parts"))
    )


# --- aggregation surface --------------------------------------------------


@query(
    "agg_rollup_region_nation",
    oracle="""
SELECT r.r_name, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
""",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets over the region→nation hierarchy."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(
        F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
    ).join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_acctbal"),
    )


@query(
    "agg_cube_flag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets over returnflag × linestatus."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_qty"),
    )


@query(
    "agg_distinct_counts",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(AVG(o_totalprice), 2) AS avg_price
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation alongside plain aggregates (two-phase
    expand+agg plan in Spark)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the sketch path a 100 TB
    distinct-count takes. The HLL estimate itself is engine-specific, so
    the query outputs the EXACT count plus ``approx_ok`` = 'estimate
    within 5% relative error of exact' computed Spark-side; the oracle
    emits the exact counts and ``TRUE`` — i.e. the hash match itself
    enforces the sketch's error bound in SQL (rsd 0.02 → 5% is a
    comfortable margin)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.abs(
                F.approx_count_distinct("l_partkey", 0.02).cast("double")
                - F.countDistinct("l_partkey").cast("double")
            )
            / F.countDistinct("l_partkey").cast("double")
            <= F.lit(0.05)
        ).alias("approx_ok"),
    )


@query(
    "agg_stats_moments",
    oracle="""
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_extendedprice), 2) AS std_price,
       ROUND(VAR_SAMP(l_extendedprice), 2) AS var_price,
       ROUND(MIN(l_extendedprice), 2) AS min_price,
       ROUND(MAX(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance) per group."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("var_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


# --- window functions -----------------------------------------------------


@query(
    "window_topk_orders_per_customer",
    oracle="""
SELECT * FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
    FROM orders
) WHERE rn <= 3
""",
)
def window_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number — the distributed top-k pattern
    (partition-local sort after one shuffle on the partition key)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_rank_dense_rank",
    oracle="""
SELECT p_brand, p_partkey, p_retailprice,
       CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
            AS INTEGER) AS price_rank,
       CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC)
            AS INTEGER) AS price_dense_rank
FROM part
""",
)
def window_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank — tie-aware ranking (well-defined under ties,
    unlike row_number, so no tiebreak column needed)."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"))
    return p.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
    )


@query(
    "window_lag_lead_event_gap",
    oracle="""
SELECT user_id, event_id, ts,
       CAST(date_diff('second',
            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
            AS BIGINT) AS gap_seconds,
       LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS next_event_type
FROM events
""",
)
def window_lag_lead_event_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the event stream: inter-event gap seconds and next
    event type per user. Deterministic order via (ts, event_id)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts)).alias("gap_seconds"),
        F.lead("event_type").over(w).alias("next_event_type"),
    )


@query(
    "window_rolling_avg",
    oracle="""
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w4 AS DOUBLE)
           / COUNT(*) OVER w4 AS rolling_avg_4,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_sum
FROM events WHERE value IS NOT NULL
WINDOW w4 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def window_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling frame (rowsBetween) aggregates: 4-row moving average and
    running sum per user. Sums go through DECIMAL and the average is an
    exact double division (sum/count) — frame averages over tiny counts
    land on exact decimal ties where engines' float rounding diverges,
    so no post-rounding at all."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w4 = w.rowsBetween(-3, 0)
    dec_sum4 = F.sum(F.col("value").cast("decimal(18,2)")).over(w4).cast("double")
    return ev.select(
        "user_id",
        "event_id",
        (dec_sum4 / F.count(F.lit(1)).over(w4)).alias("rolling_avg_4"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_sum"),
    )


# --- sorts / limits / set ops --------------------------------------------


@query(
    "sort_limit_top_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heap + driver merge, no global sort shuffle."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "set_ops_user_cohorts",
    oracle="""
WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
     errorers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
     signups AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'signup')
SELECT user_id, 'buyer_and_errorer' AS cohort
FROM (SELECT user_id FROM buyers INTERSECT SELECT user_id FROM errorers)
UNION ALL
SELECT user_id, 'signup_never_bought' AS cohort
FROM (SELECT user_id FROM signups EXCEPT SELECT user_id FROM buyers)
""",
)
def set_ops_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """intersect / except / unionByName / distinct over user cohorts."""
    ev = load(spark, sf_dir, "events")
    cohort = lambda t: ev.filter(F.col("event_type") == t).select("user_id").distinct()  # noqa: E731
    both = cohort("purchase").intersect(cohort("error")).withColumn(
        "cohort", F.lit("buyer_and_errorer")
    )
    lost = cohort("signup").exceptAll(cohort("purchase")).distinct().withColumn(
        "cohort", F.lit("signup_never_bought")
    )
    return both.unionByName(lost)


# --- scalar function families --------------------------------------------


@query(
    "string_funcs_part",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       CAST(LENGTH(p_name) AS BIGINT) AS name_len,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       regexp_extract(p_type, '^([A-Z]+)', 1) AS type_head,
       REPLACE(p_name, ' ', '_') AS name_snake
FROM part
""",
)
def string_funcs_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/substring/length/concat/regexp/replace
    (generalizes B6's upper-normalization, ``scanner.rs:175``)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("long").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_type", r"^([A-Z]+)", 1).alias("type_head"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
    )


@query(
    "datetime_funcs_orders",
    oracle="""
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS order_month,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_m,
       CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS order_dow,
       strftime(o_orderdate, '%d.%m.%Y - %H:%M:%S') AS formatted,
       CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT)
           AS days_to_y2k
FROM orders
""",
)
def datetime_funcs_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime family: date_trunc/year/month/dow, the reference's
    ``DD.MM.YYYY - HH:MM:SS`` log format (C2, ``utils.rs:12-16``), and
    duration arithmetic (C3, ``utils.rs:21-23``)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("order_month"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_m"),
        F.dayofweek("o_orderdate").alias("order_dow"),
        F.date_format("o_orderdate", "dd.MM.yyyy - HH:mm:ss").alias("formatted"),
        (
            (
                F.unix_timestamp(F.lit("2000-01-01").cast("timestamp"))
                - F.unix_timestamp("o_orderdate")
            )
            / 86400
        )
        .cast("long")
        .alias("days_to_y2k"),
    )


@query(
    "math_funcs_lineitem",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 0) AS price_rounded,
       LEAST(l_quantity, 25.0) AS qty_clamped,
       GREATEST(l_discount, 0.02) AS disc_floored,
       CAST(((CAST(l_partkey AS INTEGER) % 256) + 256) % 256 AS INTEGER) AS pk_mod,
       ABS(l_extendedprice - l_quantity * 1000) AS price_gap,
       CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_decile,
       CAST(CEIL(l_discount * 100) AS BIGINT) AS disc_pct_ceil
FROM lineitem WHERE l_orderkey < 500
""",
)
def math_funcs_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/least/greatest/pmod/abs/floor/ceil
    (generalizes B4/B5 and A3's mod-256, ``utils.rs:69``)."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 0).alias("price_rounded"),
        F.least("l_quantity", F.lit(25.0)).alias("qty_clamped"),
        F.greatest("l_discount", F.lit(0.02)).alias("disc_floored"),
        F.pmod(F.col("l_partkey").cast("int"), F.lit(256)).alias("pk_mod"),
        F.abs(F.col("l_extendedprice") - F.col("l_quantity") * 1000).alias(
            "price_gap"
        ),
        F.floor(F.col("l_quantity") / 10).alias("qty_decile"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
    )


@query(
    "json_funcs_events",
    oracle="""
SELECT event_id,
       CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS INTEGER) AS k_value,
       CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS INTEGER) % 10 AS k_mod
FROM events
""",
)
def json_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family: parse ``events.props`` with from_json → typed struct
    field access (Spark side exercises the real JSON parser; the oracle
    extracts the same value by regex so it does not depend on DuckDB's
    json extension)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_id",
        F.from_json("props", "k INT").alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k_value"),
        (F.col("p.k") % 10).alias("k_mod"),
    )


@query(
    "array_funcs_embeddings",
    oracle="""
SELECT vec_id, label,
       CAST(len(embedding) AS INTEGER) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 4) AS first_component,
       ROUND(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm
FROM embeddings
""",
)
def array_funcs_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: size/element_at/transform/aggregate over the
    embedding column (generalizes B7's map extraction; float math in
    double like the vectors module)."""
    em = load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return em.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias(
            "first_component"
        ),
        F.round(sq, 4).alias("sq_norm"),
    )
