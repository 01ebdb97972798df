"""Sixth relational wave: multiset set operations (INTERSECT ALL /
EXCEPT ALL), purposeful cross join (dense dimension×time grid), and
forward-fill imputation via IGNORE NULLS window frames — the remaining
§2.1 set-op/window gaps plus the gap-filling pattern every time-series
training pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load
from .registry import query


@query(
    "set_ops_intersect_all",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
GROUP BY o_orderpriority
""",
)
def set_ops_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset intersection — per-value multiplicity is
    min of the two sides, unlike the dedup-ing INTERSECT). Spark plans
    it as a count-comparing aggregate on the value key: one shuffle per
    side, no pairwise join."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return (
        a.intersectAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "set_ops_except_all",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
FROM (
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O')
GROUP BY o_orderpriority
""",
)
def set_ops_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset difference — multiplicities subtract,
    flooring at zero). Same aggregate-on-value plan shape as
    INTERSECT ALL."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return (
        a.exceptAll(b)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "cross_join_dense_grid",
    oracle="""
WITH years AS (SELECT DISTINCT CAST(year(o_orderdate) AS INT) AS yr FROM orders),
rev AS (
    SELECT n.n_name, CAST(year(o.o_orderdate) AS INT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name, yr
)
SELECT na.n_name, y.yr, CAST(COALESCE(r.n_orders, 0) AS BIGINT) AS n_orders
FROM nation na
CROSS JOIN years y
LEFT JOIN rev r ON r.n_name = na.n_name AND r.yr = y.yr
""",
)
def cross_join_dense_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purposeful CROSS JOIN: densify the (nation × order-year) grid so
    zero-activity cells exist explicitly (the shape every time-series
    model input needs). Both grid sides are tiny (dims × distinct
    years) so the cross product is a broadcast nested loop over a few
    hundred rows, then a broadcast left join fills in observed counts —
    the fact table is touched exactly once."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    years = o.select(F.year("o_orderdate").alias("yr")).distinct()
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.count(F.lit(1)).alias("n_orders_obs"))
    )
    grid = n.select("n_name").crossJoin(F.broadcast(years))
    return (
        grid.join(F.broadcast(rev), ["n_name", "yr"], "left")
        .select(
            "n_name",
            "yr",
            F.coalesce("n_orders_obs", F.lit(0)).cast("bigint").alias("n_orders"),
        )
    )


@query(
    "window_fill_forward",
    oracle="""
SELECT event_id, user_id,
       last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
FROM events
""",
)
def window_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill imputation: error readings are nulled out and
    replaced by the user's last good value (last_value IGNORE NULLS
    over an unbounded-preceding ROWS frame). One shuffle on user_id;
    the fill is a running scan per sorted partition — the standard
    sensor-gap repair before feature extraction. Values are carried,
    not recomputed, so parity is exact with no float discipline
    needed. Deterministic tie-break: (ts, event_id)."""
    ev = load(spark, sf_dir, "events")
    good = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(good, ignorenulls=True).over(w).alias("filled"),
    )


@query(
    "window_ntile_distribution",
    oracle="""
SELECT o_orderkey,
       o_orderstatus,
       CAST(ntile(4) OVER w AS INT) AS price_quartile,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
""",
)
def window_ntile_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile(4) quartiles, percent_rank,
    cume_dist of order value within each status. ntile assigns by row
    POSITION, so the orderBy carries an explicit orderkey tie-break —
    without it, equal prices would make quartile membership
    partition-order dependent (the same discipline as A3's
    order-sensitive first/last). One shuffle on o_orderstatus."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(4).over(w).alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "agg_approx_percentile",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(quantile_cont(value, 0.5), 4) AS p50_exact,
       ROUND(quantile_cont(value, 0.9), 4) AS p90_exact,
       ROUND(quantile_cont(value, 0.99), 4) AS p99_exact,
       TRUE AS approx_ok
FROM events WHERE value IS NOT NULL
GROUP BY event_type
""",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile per event type: the GK-sketch path for
    quantiles at 100 TB, where exact percentile's full sort-per-group is
    the bottleneck (mergeable sketches → map-side partials, one small
    shuffle). The sketch value is engine-specific, so the output carries
    the EXACT percentiles plus ``approx_ok`` = 'each sketch quantile
    lies between the exact quantiles at q∓0.01' (accuracy 10000 → rank
    error ≤1e-4, two orders inside that bracket); the oracle emits the
    exact values and TRUE, so the hash match enforces the bound."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    approx = F.percentile_approx("value", [0.5, 0.9, 0.99], 10000)
    lo = F.expr("percentile(value, array(0.49D, 0.89D, 0.98D))")
    hi = F.expr("percentile(value, array(0.51D, 0.91D, 1.0D))")
    ok = F.aggregate(
        F.zip_with(
            F.zip_with(approx, lo, lambda a, l: a >= l),
            F.zip_with(approx, hi, lambda a, h: a <= h),
            lambda x, y: x & y,
        ),
        F.lit(True),
        lambda acc, v: acc & v,
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50_exact"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90_exact"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99_exact"),
        ok.alias("approx_ok"),
    )


@query(
    "json_roundtrip_events",
    oracle="""
SELECT event_id,
       CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS INTEGER) AS k_value,
       '{"k":' || regexp_extract(props, '"k": *(-?[0-9]+)', 1) || '}' AS rejson
FROM events
""",
)
def json_roundtrip_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path access + re-serialization: get_json_object pulls $.k
    without a full parse (a codegen'd path evaluator — the cheap way to
    probe one field out of a huge JSON blob at scale), and to_json
    re-serializes the typed struct. The oracle rebuilds the canonical
    serialization by string concat so it does not depend on DuckDB's
    json extension."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        k.alias("k_value"),
        F.to_json(F.struct(k.alias("k"))).alias("rejson"),
    )


@query(
    "stat_freq_items",
    oracle="""
WITH pr AS (
    SELECT o_orderpriority AS item FROM orders
    GROUP BY o_orderpriority
    HAVING COUNT(*) > 0.1 * (SELECT COUNT(*) FROM orders)
),
st AS (
    SELECT o_orderstatus AS item FROM orders
    GROUP BY o_orderstatus
    HAVING COUNT(*) > 0.1 * (SELECT COUNT(*) FROM orders)
)
SELECT list_sort(list(pr.item)) AS exact_freq_priorities,
       (SELECT list_sort(list(st.item)) FROM st) AS exact_freq_statuses,
       TRUE AS sketch_ok
FROM pr
""",
)
def stat_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate frequent items (Karp-Papadimitriou-Shenker sketch)
    over order priority and status: the one-pass, mergeable heavy-hitter
    estimator for 100 TB categorical profiling. The sketch's candidate
    list is engine-specific, but KPS guarantees NO FALSE NEGATIVES at
    the support threshold — so the output carries the exact frequent
    sets plus ``sketch_ok`` = 'sketch candidates ⊇ exact frequent
    items', and the oracle (exact group-by-HAVING twins + TRUE) turns
    that guarantee into a hash-checked bound."""
    o = load(spark, sf_dir, "orders")
    sketch = o.stat.freqItems(
        ["o_orderpriority", "o_orderstatus"], support=0.1
    ).select(
        F.col("o_orderpriority_freqItems").alias("sk_pr"),
        F.col("o_orderstatus_freqItems").alias("sk_st"),
    )
    n_orders = o.agg(F.count(F.lit(1)).alias("_n"))
    exact_pr = (
        o.groupBy(F.col("o_orderpriority").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_orders))
        .filter(F.col("cnt") > 0.1 * F.col("_n"))
        .agg(F.array_sort(F.collect_list("item")).alias("exact_freq_priorities"))
    )
    exact_st = (
        o.groupBy(F.col("o_orderstatus").alias("item"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n_orders))
        .filter(F.col("cnt") > 0.1 * F.col("_n"))
        .agg(F.array_sort(F.collect_list("item")).alias("exact_freq_statuses"))
    )
    return (
        sketch.crossJoin(F.broadcast(exact_pr))
        .crossJoin(F.broadcast(exact_st))
        .select(
            "exact_freq_priorities",
            "exact_freq_statuses",
            (
                (
                    F.size(
                        F.array_except(F.col("exact_freq_priorities"), F.col("sk_pr"))
                    )
                    == 0
                )
                & (
                    F.size(
                        F.array_except(F.col("exact_freq_statuses"), F.col("sk_st"))
                    )
                    == 0
                )
            ).alias("sketch_ok"),
        )
    )


@query(
    "q2_min_cost_supplier_wins",
    oracle="""
WITH ranked AS (
    SELECT l_partkey, l_suppkey,
           row_number() OVER (
               PARTITION BY l_partkey
               ORDER BY l_extendedprice / l_quantity, l_suppkey) AS rn
    FROM lineitem
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS parts_won
FROM ranked r JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.rn = 1
GROUP BY s.s_name
""",
)
def q2_min_cost_supplier_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted to this schema): the correlated
    min-cost-supplier subquery becomes a per-part window argmin — which
    supplier offers each part at the lowest unit price — then a win
    count per supplier. Unit price is a single per-row IEEE division of
    identical inputs on both engines, so the ORDER BY is bit-stable;
    ties break on suppkey. One shuffle on partkey for the window, one
    broadcast join to supplier, one count shuffle."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    w = Window.partitionBy("l_partkey").orderBy(
        (F.col("l_extendedprice") / F.col("l_quantity")).asc(),
        F.col("l_suppkey").asc(),
    )
    winners = (
        li.select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        winners.join(F.broadcast(s), winners["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("parts_won"))
    )


@query(
    "array_predicates_embeddings",
    oracle="""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_positive,
       (len(list_filter(embedding, x -> x < -0.2)) > 0) AS has_strong_negative,
       (len(list_filter(embedding, x -> abs(x) > 1.0)) = 0) AS all_unit_bounded
FROM embeddings
""",
)
def array_predicates_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order predicates — filter/exists/forall over the
    embedding column, all inside codegen (the per-row feature-gating
    shape a training pipeline runs before batching). Comparisons only,
    no float arithmetic → exact parity; DuckDB states exists/forall via
    list_filter counts."""
    em = load(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return em.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_positive"),
        F.exists(e, lambda x: x < -0.2).alias("has_strong_negative"),
        F.forall(e, lambda x: F.abs(x) <= 1.0).alias("all_unit_bounded"),
    )
