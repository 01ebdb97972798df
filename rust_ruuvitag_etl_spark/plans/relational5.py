"""Fifth relational wave: the remaining classic TPC-H query shapes
(existential semi-join, nation-pair theta over a 5-table join, top-k
enrichment, conditional-share scalar, HAVING-subquery join-back,
disjunctive multi-range predicates) plus the window/join/lateral gaps —
right outer join, time-RANGE rolling frames, non-correlated scalar
subquery, positional explode.

These generalize SURVEY.md §2.1's join/agg/window families. Plan
posture per query is in its docstring; the float discipline matches
relational.py (decimal sums cast to double, round once at the end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load
from .registry import query


def _rev() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")


@query(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS decorrelates to a LEFT SEMI join on
    orderkey with the date comparison as a post-join residual. The
    selective orders date filter pushes to parquet and prunes before the
    shuffle; the semi join never materializes lineitem columns, so at
    100 TB the shuffle carries only (orderkey, shipdate)."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o["o_orderkey"] == li["l_orderkey"])
            & (li["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q7_nation_pair_volume",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q7_nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between a nation pair by ship year.
    Five joins, but three sides (nation ×2, supplier) are dims —
    broadcast hash joins, zero shuffle. Only lineitem⋈orders shuffles
    on orderkey; the disjunctive nation-pair filter applies after the
    broadcasts, and Catalyst pushes the single-nation legs of the OR
    into each branch where possible."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       ROUND(c.c_acctbal, 2) AS c_acctbal, n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.
    Both filters (order date range, returnflag) push to the scans;
    nation broadcasts; orders⋈lineitem shuffles on orderkey and the
    result re-shuffles on custkey for the agg. The final top-20 is
    TakeOrderedAndProject — no global sort materializes."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_share",
    oracle="""
SELECT ROUND(
    100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))
        ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
  / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
        AS DOUBLE), 4) AS promo_share_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
  AND l.l_shipdate < TIMESTAMP '1997-10-01'
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month. The
    month filter prunes lineitem at the scan; part (2k rows per sf unit)
    broadcasts, so the whole query is one scan + one broadcast join +
    a single-row global aggregate — no wide shuffle at any scale. Both
    sums run in decimal; the division happens once, in double, on the
    two exact totals, so the ratio is partition-order independent."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.round(
                100.0
                * F.sum(promo).cast("double")
                / F.sum(_rev()).cast("double"),
                4,
            ).alias("promo_share_pct")
        )
    )


@query(
    "q18_large_volume_orders",
    oracle="""
SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
       ROUND(o.o_totalprice, 2) AS o_totalprice,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
""",
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-subquery (orders whose total quantity
    exceeds a threshold) joined back to customer/orders/lineitem. The
    inner aggregate shuffles lineitem on orderkey once; the IN becomes a
    LEFT SEMI join that reuses the same key, and AQE turns the (few
    surviving orderkeys) semi side into a broadcast at runtime."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("bigint").alias("l_quantity")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    o = load(spark, sf_dir, "orders").join(
        big.select("l_orderkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "sum_qty",
        )
    )


@query(
    "q19_disjunctive_predicates",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs mixing join-side and probe-side
    ranges. Catalyst extracts the common subexpressions: the
    brand/size legs filter the broadcast part build side, and the
    derivable quantity envelope (1..30) pushes to the lineitem scan, so
    the disjunction never forces a full-table nested-loop."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
        .filter(cond)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "join_right_outer_segments",
    oracle="""
SELECT c.c_mktsegment,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
FROM orders o
RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def join_right_outer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: every customer survives, order-less customers
    contribute NULL order rows (counted by n_customers but not
    n_orders). Catalyst canonicalizes right-outer to left-outer with
    swapped sides, so the physical plan is the same shuffled hash join
    either way; the count(col) vs count(*) distinction is what the
    outer-ness is for."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"], "right")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "window_range_time_1h",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
            PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        AS DOUBLE) AS rolling_1h
FROM events
""",
)
def window_range_time_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling frame: per-user sum of `value` over the
    trailing hour, ordered by event time in microseconds. RANGE (not
    ROWS) so simultaneous events are frame-peers deterministically.
    One shuffle on user_id; frames evaluate with a sliding pointer over
    each sorted partition — O(n) per user, no self-join. The sum runs
    in decimal so the rolling total is tie-order independent."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double")
        .alias("rolling_1h"),
    )


@query(
    "scalar_subquery_half_max",
    oracle="""
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_big
FROM orders
WHERE o_totalprice > (SELECT 0.5 * MAX(o_totalprice) FROM orders)
GROUP BY o_orderstatus
""",
)
def scalar_subquery_half_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-correlated scalar subquery: orders above half the global max
    price. The one-row threshold broadcasts (a cross join with a
    1-row relation is broadcast-nested-loop, cost ~0); MAX is exact in
    double, so the threshold is bit-identical across engines — unlike an
    AVG-based threshold, whose summation order would make boundary rows
    engine-dependent."""
    o = load(spark, sf_dir, "orders")
    thr = o.agg((F.max("o_totalprice") * 0.5).alias("thr"))
    return (
        o.join(F.broadcast(thr))
        .filter(F.col("o_totalprice") > F.col("thr"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_big"))
    )


@query(
    "posexplode_doc_tokens",
    oracle="""
SELECT doc_id, CAST(generate_subscripts(l, 1) - 1 AS INT) AS pos,
       unnest(l) AS token
FROM (SELECT doc_id, string_split(text, ' ') AS l
      FROM documents WHERE doc_id % 5 = 0)
""",
)
def posexplode_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (lateral view): documents → one row per token
    with its 0-based position. A narrow transform — each row expands in
    place with no shuffle — which is why tokenization at 100 TB is
    embarrassingly parallel as long as downstream aggs re-key. The
    doc_id % 5 filter keeps the differential result bounded."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey)
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: aggregate-of-aggregate — per-customer order
    count (left outer join keeps zero-order customers, with a join-side
    residual predicate), then a histogram of those counts. Two
    shuffles: custkey, then c_count; the second input is already tiny
    (one row per customer). count(o_orderkey) not count(*): NULL join
    rows must count as zero."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q17_small_quantity_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
    SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
    FROM lineitem GROUP BY l_partkey
) t ON t.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < t.qty_threshold
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated avg-quantity subquery decorrelated
    into a per-part aggregate joined back to lineitem. The threshold
    compare (l_quantity < 0.2*avg) is float but bit-stable across
    engines: quantities are integral doubles, so per-part sums are
    exact integers (order-independent), avg is one exact-by-exact
    division, and 0.2*avg is one more identical IEEE op on both sides.
    The revenue sum still goes through decimal."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(thresholds, li["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
