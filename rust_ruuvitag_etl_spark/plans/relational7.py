"""The nine TPC-H shapes absent from rounds ≤1 (Q8, Q9, Q11, Q12, Q15,
Q16, Q20, Q21, Q22), completing all 22. The testdata star schema has no
``partsupp`` table and no comment/phone/commitdate/receiptdate columns,
so each query keeps its defining STRUCTURE (the join topology, the
subquery/decorrelation pattern, the aggregation shape) with predicates
adapted to the available columns; the adaptation is noted per query.

Decorrelation posture (the reason these shapes matter): scalar
subqueries become 1-row broadcast scalars, EXISTS becomes left-semi,
NOT EXISTS becomes left-anti — all equi-keyed, no nested-loop plans.
Floats follow the house rule: aggregate in DECIMAL, cast/round once at
the end, identically in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from .registry import query

_VOL6 = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))"


def _vol6() -> F.Column:
    return (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )


@query(
    "q8_national_market_share",
    oracle=f"""
WITH base AS (
    SELECT CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
           {_VOL6} AS volume,
           ns.n_name AS supp_nation
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <= TIMESTAMP '1997-12-31'
)
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM base GROUP BY o_year
""",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way snowflake join + conditional-share
    aggregate (NATION_3's share of ECONOMY-part volume sold into ASIA,
    by order year). All five dimensions broadcast; the only shuffles are
    the lineitem↔orders fact join and the 2-row final agg. Share =
    decimal-sum ÷ decimal-sum, each exact, divided once in double."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select(
        "p_partkey"
    )
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    ns = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    base = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(nc), c["c_nationkey"] == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r["r_regionkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(ns), s["s_nationkey"] == F.col("sn_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _vol6().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_product_type_profit",
    oracle="""
SELECT ns.n_name AS nation,
       CAST(YEAR(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity AS DECIMAL(18,6)))
            AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN nation ns ON ns.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY nation, o_year
""",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year over a
    part-name pattern. Adaptation: no partsupp table, so unit cost is
    ``p_retailprice`` instead of ``ps_supplycost`` (same 5-way join
    topology, same LIKE-pushdown + group-by-dim-year aggregate).
    part/supplier/nation broadcast; lineitem↔orders is the one fact
    shuffle; profit summed in decimal."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), s["s_nationkey"] == F.col("sn_key"))
        .select("nation", F.year("o_orderdate").alias("o_year"), profit.alias("pr"))
        .groupBy("nation", "o_year")
        .agg(F.sum("pr").cast("double").alias("sum_profit"))
    )


@query(
    "q11_important_inventory",
    oracle=f"""
WITH pv AS (
    SELECT l.l_partkey AS partkey,
           SUM({_VOL6}) AS value
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
    GROUP BY partkey
)
SELECT partkey, CAST(value AS DOUBLE) AS total_value
FROM pv
WHERE CAST(value AS DOUBLE) >
      (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM pv)
""",
)
def q11_important_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a global-fraction scalar
    threshold. Adaptation: no partsupp, so 'inventory value' is the
    discounted lineitem revenue routed through EUROPE suppliers. The
    scalar subquery decorrelates into a 1-row grand-total aggregate
    broadcast back onto the per-part AGGREGATE (|parts| rows, not
    lineitem) — the fact chain is scanned once, and NO row set ever
    funnels into a single partition (an unpartitioned window here would
    move every per-part row to one task at 100×; a 1-row broadcast
    crossJoin keeps the threshold compare scan-local). Both sums are
    exact decimals, so the double threshold compare is engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    pv = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(_vol6()).alias("value"))
    )
    thr = pv.agg(
        (F.sum("value").cast("double") * F.lit(0.001)).alias("_thr")
    )
    return (
        pv.crossJoin(F.broadcast(thr))
        .filter(F.col("value").cast("double") > F.col("_thr"))
        .select("partkey", F.col("value").cast("double").alias("total_value"))
    )


@query(
    "q12_shipping_delay_classes",
    oracle="""
SELECT delay_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_prio_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_prio_count
FROM (
    SELECT o.o_orderpriority,
           CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 120
                     THEN 'very_late'
                WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 60
                     THEN 'late'
                ELSE 'on_time' END AS delay_class
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey)
GROUP BY delay_class
""",
)
def q12_shipping_delay_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: priority-split CASE-sum counts per shipping
    bucket. Adaptation: no shipmode/commitdate/receiptdate columns, so
    the bucket is ship-delay days (l_shipdate − o_orderdate) classed
    into on_time/late/very_late. One fact-fact join, one 3-row agg;
    the CASE sums combine map-side."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    klass = (
        F.when(delay > 120, "very_late").when(delay > 60, "late").otherwise("on_time")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(klass.alias("delay_class"), high.alias("_h"))
        .groupBy("delay_class")
        .agg(
            F.sum(F.when(F.col("_h"), 1).otherwise(0)).alias("high_prio_count"),
            F.sum(F.when(~F.col("_h"), 1).otherwise(0)).alias("low_prio_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           SUM({_VOL6}) AS total_rev
    FROM lineitem l
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    GROUP BY supplier_no
)
SELECT s.s_suppkey, s.s_name, CAST(rev.total_rev AS DOUBLE) AS total_revenue
FROM supplier s JOIN rev ON s.s_suppkey = rev.supplier_no
WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the scalar-max revenue view — suppliers whose
    quarterly revenue equals the maximum. The view aggregates once; the
    scalar max is a 1-row aggregate broadcast back onto the per-supplier
    rows (an unpartitioned window would funnel ALL per-supplier rows
    into one task to find the max — a single-reducer pass at 100× the
    supplier cardinality; the 1-row crossJoin keeps the equality filter
    scan-local). The compare runs on exact decimal sums (no float-tie
    hazard)."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_vol6()).alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("_max"))
    top = rev.crossJoin(F.broadcast(mx)).filter(
        F.col("total_rev") == F.col("_max")
    )
    return (
        F.broadcast(s)
        .join(top, s["s_suppkey"] == top["supplier_no"])
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


@query(
    "q16_supplier_part_count",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part facet with a
    NOT-IN exclusion subquery. Adaptation: no partsupp/comment columns —
    supply relationships come from lineitem and the excluded-supplier
    set is negative-balance suppliers. NOT IN decorrelates to a
    broadcast left-anti join (the set is non-null by construction);
    count-distinct shuffles once on the facet key."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excl = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            F.broadcast(excl), li["l_suppkey"] == excl["s_suppkey"], "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_potential_promotion",
    oracle="""
WITH shipped AS (
    SELECT l.l_suppkey,
           SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE 'small%'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE s.s_suppkey IN
      (SELECT l_suppkey FROM shipped WHERE CAST(qty AS DOUBLE) > 350.0)
""",
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: the nested IN-chain (suppliers → shipped
    aggregate → part-name filter) as a left-semi join over a HAVING
    aggregate. Adaptation: no partsupp availqty, so the threshold is an
    top-quartile shipped-quantity floor (350) over 'small%' parts in 1997.
    part broadcast into lineitem; one agg keyed by suppkey; semi-join
    back to supplier (broadcast, 100 rows)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
        .filter(F.col("qty").cast("double") > 350.0)
        .select("l_suppkey")
    )
    return s.join(
        F.broadcast(shipped), s["s_suppkey"] == shipped["l_suppkey"], "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q21_waiting_suppliers",
    oracle="""
WITH late AS (
    SELECT DISTINCT l.l_orderkey, l.l_suppkey
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND date_diff('day', o.o_orderdate, l.l_shipdate) > 60
),
multi AS (
    SELECT DISTINCT a.l_orderkey, a.l_suppkey
    FROM late a JOIN lineitem b
      ON b.l_orderkey = a.l_orderkey AND b.l_suppkey <> a.l_suppkey
),
waiting AS (
    SELECT m.l_orderkey, m.l_suppkey FROM multi m
    WHERE NOT EXISTS (SELECT 1 FROM late x
                      WHERE x.l_orderkey = m.l_orderkey
                        AND x.l_suppkey <> m.l_suppkey)
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM waiting w JOIN supplier s ON s.s_suppkey = w.l_suppkey
GROUP BY s.s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS + NOT-EXISTS self-join chain — the
    sole late supplier on a finished multi-supplier order. Adaptation:
    lateness is l_shipdate > o_orderdate + 60 days (no
    commit/receiptdate columns). EXISTS → left-semi, NOT EXISTS →
    left-anti, both equi-keyed on l_orderkey with the supplier
    inequality as residual — no nested-loop anywhere; supplier
    broadcast for the final count."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60)
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    lines = li.select(
        F.col("l_orderkey").alias("b_orderkey"), F.col("l_suppkey").alias("b_suppkey")
    )
    multi = late.join(
        lines,
        (late["l_orderkey"] == F.col("b_orderkey"))
        & (late["l_suppkey"] != F.col("b_suppkey")),
        "left_semi",
    )
    other_late = late.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    waiting = multi.join(
        other_late,
        (multi["l_orderkey"] == F.col("x_orderkey"))
        & (multi["l_suppkey"] != F.col("x_suppkey")),
        "left_anti",
    )
    return (
        waiting.join(F.broadcast(s), waiting["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
WITH eligible AS (
    SELECT right(c_name, 1) AS cntrycode, c_custkey,
           CAST(c_acctbal AS DECIMAL(18,2)) AS bal
    FROM customer
    WHERE right(c_name, 1) IN ('1', '3', '5', '7', '9')
      AND c_acctbal > 0.0
),
avg_bal AS (
    SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS a FROM eligible
),
inactive AS (
    SELECT e.* FROM eligible e
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = e.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
)
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(bal) AS DOUBLE) AS totacctbal
FROM inactive, avg_bal
WHERE CAST(bal AS DOUBLE) > a
GROUP BY cntrycode
""",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: substring-derived customer segment + scalar-avg
    subquery + NOT-EXISTS anti join. Adaptation: no c_phone column, so
    the 'country code' is the last digit of c_name, and 'no orders'
    becomes 'no orders since 1999' (every customer has some order in
    this dataset). The avg is a 1-row broadcast scalar off an exact
    decimal sum; NOT EXISTS decorrelates to a left-anti join against the
    filtered orders keys."""
    cust = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    code = F.expr("right(c_name, 1)")
    eligible = cust.filter(
        code.isin("1", "3", "5", "7", "9") & (F.col("c_acctbal") > 0.0)
    ).select(
        code.alias("cntrycode"),
        "c_custkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    avg_bal = eligible.agg(
        (F.sum("bal").cast("double") / F.count(F.lit(1))).alias("_avg")
    )
    inactive = eligible.join(
        o, eligible["c_custkey"] == o["o_custkey"], "left_anti"
    )
    return (
        inactive.crossJoin(F.broadcast(avg_bal))  # 1-row broadcast scalar
        .filter(F.col("bal").cast("double") > F.col("_avg"))
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )


@query(
    "topk_agg_orders_per_customer",
    oracle="""
WITH l AS (
    SELECT o_custkey,
           list_slice(list({'p': o_totalprice, 'k': o_orderkey}
                ORDER BY o_totalprice DESC, o_orderkey ASC), 1, 3) AS top3
    FROM orders GROUP BY o_custkey
)
SELECT o_custkey,
       CAST((u.t).k AS BIGINT) AS o_orderkey,
       (u.t).p AS o_totalprice,
       CAST(pos AS INTEGER) AS rn
FROM l, LATERAL (SELECT unnest(top3) AS t,
                        generate_subscripts(top3, 1) AS pos) u
""",
)
def topk_agg_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k as an AGGREGATE, not a window: collect → sort →
    slice inside one hash aggregate. Same result set as
    window_topk_orders_per_customer, but the window variant must sort
    EVERY group's full row set after the shuffle, while this shape
    partial-aggregates map-side — at 100 TB the shuffle carries at most
    k rows per (group × mapper) once Spark's ObjectHashAggregate
    combines, and there is no per-group sort of the long tail. The
    deterministic (price DESC, orderkey ASC) tie-break matches the
    window twin, making the two plans result-identical and
    oracle-checked against each other's SQL shape."""
    o = load(spark, sf_dir, "orders")
    # struct sorts lexicographically: (-price, orderkey) ascending ==
    # (price DESC, orderkey ASC)
    item = F.struct(
        (-F.col("o_totalprice")).alias("np"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
    )
    top3 = F.slice(F.array_sort(F.collect_list(item)), 1, 3)
    return (
        o.groupBy("o_custkey")
        .agg(top3.alias("top3"))
        .select("o_custkey", F.posexplode("top3").alias("pos", "t"))
        .select(
            "o_custkey",
            F.col("t.k").alias("o_orderkey"),
            F.col("t.p").alias("o_totalprice"),
            (F.col("pos") + 1).cast("int").alias("rn"),
        )
    )


@query(
    "agg_corr_regression",
    oracle="""
SELECT l_returnflag,
       ROUND(corr(l_extendedprice, l_quantity), 6) AS corr_price_qty,
       ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS covar_price_qty,
       ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
       ROUND(regr_r2(l_extendedprice, l_quantity), 6) AS r2
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: correlation, sample covariance,
    and OLS regression (slope/intercept/R²) — all single-pass mergeable
    moment aggregates (partial-aggregated map-side, one tiny shuffle),
    which is why they scale where a two-pass textbook formula would not.
    Both engines use the same co-moment accumulation, so rounded values
    are engine-identical."""
    li = load(spark, sf_dir, "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr(x, y), 6).alias("corr_price_qty"),
        F.round(F.covar_samp(x, y), 4).alias("covar_price_qty"),
        F.round(F.regr_slope(x, y), 4).alias("slope"),
        F.round(F.regr_intercept(x, y), 4).alias("intercept"),
        F.round(F.regr_r2(x, y), 6).alias("r2"),
    )


@query(
    "histogram_fixed_width",
    oracle="""
SELECT event_type,
       CAST(CASE WHEN value >= 100.0 THEN 19
            ELSE floor(value / 5.0) END AS INTEGER) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events WHERE value IS NOT NULL AND value >= 0.0
GROUP BY event_type, bin
""",
)
def histogram_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (20 bins of width 5 over [0, 100], top bin
    clamped): binning is a narrow integer map computed next to the scan,
    then ONE count shuffle keyed by (type, bin) — cardinality is bins x
    types regardless of input size, the profile every ingestion
    pipeline runs at 100 TB. Integer bin arithmetic is engine-exact (no
    float-boundary hazard beyond the division both engines share)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & (F.col("value") >= 0.0)
    )
    bin_col = (
        F.when(F.col("value") >= 100.0, F.lit(19))
        .otherwise(F.floor(F.col("value") / 5.0))
        .cast("int")
    )
    return ev.groupBy("event_type", bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "fuzzy_match_levenshtein",
    oracle="""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_dist
FROM customer a JOIN customer b
  ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 2
""",
)
def fuzzy_match_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy key matching via edit distance — the record-linkage /
    fuzzy-dedup primitive for near-identical identifiers. Pair space is
    bounded by the nation blocking key (the standard blocking pattern;
    at 100 TB the block key comes from LSH or phonetic buckets), the
    Levenshtein check runs only inside blocks, and both engines share
    the same unit-cost edit-distance definition.

    The in-block check uses Spark's THRESHOLD form
    ``levenshtein(l, r, 2)`` — a banded O(len·k) dynamic program with
    early exit that returns −1 past the bound instead of the full
    O(len²) table per pair (measured 22 s → 15 s at sf0.1 on the
    ~4.5M-pair block space). For surviving pairs the bounded value
    EQUALS the true distance, so the emitted rows — and the unchanged
    full-distance oracle — are identical.

    Round 9: the probe side is round-robin ``spread`` — the small-file
    scan arrives as ONE split, so the broadcast-hash probe (where
    every banded verify runs) executed single-task and serialized the
    whole pair space on one core (the round-4 semdedup lesson,
    re-measured here: 14 s → 1.1 s at sf0.1, output frame-equal). The
    build side keeps Catalyst's SIZE-BASED join choice (broadcast at
    bench scale, sort-merge on the block key at 100 TB where the dim
    no longer fits); a pre-split production scan makes the spread a
    no-op by construction.

    Known stronger filter, deliberately not applied: PassJoin (Li,
    Deng & Feng 2011) replaces the in-block theta join with an
    equi-join on (length, segment-index, segment) keys — the exact
    sub-quadratic candidate generator for edit distance, and the shape
    a 100 TB deployment composes with the LSH/phonetic block key. On
    THIS corpus it prunes nothing: every c_name shares the constant
    'Customer#0…' prefix, so the low-index segment keys collide for
    the entire block and the candidate set degenerates to the full
    pair space while paying ~25 probe keys per row. Measured, not
    guessed — with the probe side spread, the banded verify
    parallelizes and PassJoin's extra keys would only add cost."""
    from ..operators.dedup import spread

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    a, b = spread(c, 32).alias("a"), c.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), 2)
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .filter((dist >= 0) & (dist <= 2))
        .select(
            F.col("a.c_custkey").alias("id_a"),
            F.col("b.c_custkey").alias("id_b"),
            dist.cast("int").alias("edit_dist"),
        )
    )


@query(
    "csv_roundtrip_inline",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority,
       o_orderkey || ',' || o_orderstatus || ',' || o_orderpriority AS csv_line
FROM orders
""",
)
def csv_roundtrip_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-row CSV codec round-trip: to_csv packs selected columns into a
    delimited line, from_csv parses it back with a declared schema, and
    the output carries the REPARSED fields plus the wire line — so a
    hash match proves serialize→parse is the identity (the ingestion
    path for every text-format feed). Pure expressions; the oracle
    states the expected line and fields directly."""
    o = load(spark, sf_dir, "orders")
    line = F.to_csv(F.struct("o_orderkey", "o_orderstatus", "o_orderpriority"))
    parsed = F.from_csv(
        line, "o_orderkey BIGINT, o_orderstatus STRING, o_orderpriority STRING"
    )
    return o.select(line.alias("_line"), parsed.alias("_p")).select(
        F.col("_p.o_orderkey").alias("o_orderkey"),
        F.col("_p.o_orderstatus").alias("o_orderstatus"),
        F.col("_p.o_orderpriority").alias("o_orderpriority"),
        F.col("_line").alias("csv_line"),
    )


@query(
    "string_agg_per_nation",
    oracle="""
SELECT c_nationkey,
       string_agg(c_name, ',' ORDER BY c_name) AS members,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT c_nationkey, c_name FROM customer WHERE c_acctbal > 9000)
GROUP BY c_nationkey
""",
)
def string_agg_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (LISTAGG): ordered, delimited member roster
    per nation. Spark has no ordered string_agg aggregate, so the plan
    collects, array_sorts in-row, and concat_ws joins — same one-shuffle
    hash aggregate, deterministic because the sort happens AFTER
    collection (order-dependent aggregation over an unordered shuffle
    would be nondeterministic)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("c_name"))).alias("members"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "union_by_name_evolving",
    oracle="""
SELECT o_orderkey AS id, o_totalprice AS amount, o_orderpriority AS priority,
       CAST(NULL AS VARCHAR) AS segment
FROM orders WHERE o_orderstatus = 'O'
UNION ALL
SELECT c_custkey AS id, c_acctbal AS amount, CAST(NULL AS VARCHAR) AS priority,
       c_mktsegment AS segment
FROM customer
""",
)
def union_by_name_evolving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two sources with partially overlapping
    columns combine by NAME with null fill (unionByName
    allowMissingColumns) — the ingestion pattern when feeds gain or
    lose columns over time. Positional UNION would silently misalign;
    by-name alignment is the safe default at 100 TB where upstream
    schemas drift."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("id"),
        F.col("o_totalprice").alias("amount"),
        F.col("o_orderpriority").alias("priority"),
    )
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        F.col("c_acctbal").alias("amount"),
        F.col("c_mktsegment").alias("segment"),
    )
    return o.unionByName(c, allowMissingColumns=True)
