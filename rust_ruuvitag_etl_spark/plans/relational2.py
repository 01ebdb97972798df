"""Second wave of the relational surface: predicate-pushdown scans,
pivot, exact percentiles, correlated/EXISTS subqueries, the spark.sql
passthrough API, richer window functions, HAVING, null handling, and
date arithmetic (SURVEY.md §2.1 / §3.4 dual API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load, register_views
from .registry import query


@query(
    "q6_revenue_delta",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE)
           AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate scan → global agg. Every
    predicate reaches the parquet reader (PushedFilters); the aggregate
    is a single partial+final reduction — the minimal-shuffle plan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)"))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "pivot_status_by_year",
    oracle="""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS F,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS O,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS P
FROM orders
GROUP BY year(o_orderdate)
""",
)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: order counts per status column per year. Spark's pivot
    with explicit values compiles to one aggregate with conditional
    expressions — same plan the FILTER-clause oracle describes."""
    o = load(spark, sf_dir, "orders")
    out = (
        o.select(F.year("o_orderdate").alias("order_year"), "o_orderstatus")
        .groupBy("order_year")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    # pivot leaves missing combinations NULL; counts should read 0
    return out.select(
        "order_year",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    )


@query(
    "percentiles_event_values",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 4) AS p50,
       ROUND(quantile_cont(value, 0.9), 4) AS p90,
       ROUND(quantile_cont(value, 0.99), 4) AS p99
FROM events WHERE value IS NOT NULL
GROUP BY event_type
""",
)
def percentiles_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) per group — Spark's
    `percentile` and DuckDB's `quantile_cont` share the continuous
    quantile definition."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
    )


@query(
    "correlated_above_nation_avg",
    oracle="""
SELECT c.c_custkey, c.c_name, c.c_nationkey
FROM customer c
WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                     WHERE c2.c_nationkey = c.c_nationkey)
""",
)
def correlated_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's mean
    balance. Expressed as aggregate + re-join (what Catalyst decorrelates
    the subquery into anyway); comparison on raw doubles is safe because
    both engines compute the same single-partition-per-nation average."""
    c = load(spark, sf_dir, "customer")
    nation_avg = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("_avg"))
    return (
        c.join(F.broadcast(nation_avg), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .select("c_custkey", "c_name", "c_nationkey")
    )


@query(
    "sql_passthrough_exists",
    oracle="""
SELECT o.o_orderkey, o.o_totalprice
FROM orders o
WHERE o.o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09)
""",
)
def sql_passthrough_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql surface (SURVEY §3.4: both APIs share Catalyst):
    raw ANSI SQL with an EXISTS subquery over registered temp views —
    proving a reference user can keep writing SQL against this engine."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_discount >= 0.09)
        """
    )


@query(
    "window_value_functions",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS last_price,
       CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value (full frame) / ntile / percent_rank /
    cume_dist per customer order history, deterministically ordered."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "having_big_segments",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY c_mktsegment
HAVING COUNT(*) > 250 AND SUM(c_acctbal) > 0
""",
)
def having_big_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — post-aggregation filters."""
    c = load(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_bal"),
        )
        .filter((F.col("n") > 250) & (F.col("total_bal") > 0))
    )


@query(
    "null_handling_events",
    oracle="""
SELECT event_id,
       COALESCE(NULLIF(event_type, 'error'), 'recovered') AS type_patched,
       CASE WHEN value > 250 THEN 'high'
            WHEN value > 100 THEN 'mid'
            ELSE 'low' END AS value_band,
       CAST(value IS NULL AS BOOLEAN) AS value_missing,
       IFNULL(NULLIF(user_id, 0), -1) AS user_patched
FROM events
""",
)
def null_handling_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling family: nullif/coalesce/ifnull + CASE banding."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("recovered")).alias(
            "type_patched"
        ),
        F.when(F.col("value") > 250, "high")
        .when(F.col("value") > 100, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.col("value").isNull().alias("value_missing"),
        F.ifnull(F.nullif("user_id", F.lit(0)), F.lit(-1)).alias("user_patched"),
    )


@query(
    "date_arithmetic_orders",
    oracle="""
SELECT o_orderkey,
       o_orderdate + INTERVAL 30 DAYS AS due_date,
       o_orderdate + INTERVAL 3 MONTHS AS review_date,
       CAST(date_part('quarter', o_orderdate) AS INTEGER) AS order_quarter,
       CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_day,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
FROM orders WHERE o_orderkey < 1000
""",
)
def date_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic family: interval add, add_months (month-end
    clamped in both engines), quarter extraction, date truncation,
    last_day. DATE-typed outputs are cast back to TIMESTAMP on both
    sides — pandas renders DuckDB DATEs as midnight datetimes, so a
    date-typed column can never value-compare cleanly."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("review_date"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.col("o_orderdate").cast("date").cast("timestamp").alias("order_day"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@query(
    "conditional_aggregation",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) FILTER (WHERE l_discount > 0.05) AS BIGINT)
           AS n_discounted,
       CAST(SUM(CAST(CASE WHEN l_tax > 0.04 THEN l_extendedprice ELSE 0 END
                     AS DECIMAL(18,2))) AS DOUBLE) AS taxed_value,
       ROUND(AVG(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4)
           AS avg_qty_filled
FROM lineitem
GROUP BY l_returnflag
""",
)
def conditional_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: FILTER-style counts, CASE-guarded sums,
    NULL-skipping conditional averages."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.sum(
            F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))
            .otherwise(0.0)
            .cast("decimal(18,2)")
        )
        .cast("double")
        .alias("taxed_value"),
        F.round(
            F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))), 4
        ).alias("avg_qty_filled"),
    )
