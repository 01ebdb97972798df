"""Third relational wave: explicit GROUPING SETS, collect_list/set,
map functions, string padding/case/LIKE families, min_by/max_by,
boolean aggregates, bitwise ops, explode-join shapes (SURVEY.md §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load, register_views
from .registry import query


@query(
    "grouping_sets_explicit",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
           AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — finer than rollup/cube
    (via the SQL surface; both engines share the gid bit convention)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
                   AS gid
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        """
    )


@query(
    "collect_sorted_arrays",
    oracle="""
SELECT n_regionkey,
       list_sort(list(n_name)) AS nations,
       CAST(len(list(n_name)) AS INTEGER) AS n_nations
FROM nation
GROUP BY n_regionkey
""",
)
def collect_sorted_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list into sorted arrays (sort_array makes the otherwise
    partition-order-dependent result deterministic and comparable)."""
    n = load(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_list("n_name")).alias("nations"),
        F.size(F.collect_list("n_name")).alias("n_nations"),
    )


@query(
    "map_functions_region",
    oracle="""
WITH m AS (
    SELECT map(list(r_name), list(CAST(r_regionkey AS BIGINT))) AS rm
    FROM region
)
SELECT 'ASIA' AS key_name,
       rm['ASIA'][1] AS asia_key,
       CAST(cardinality(rm) AS INTEGER) AS n_keys,
       list_sort(map_keys(rm)) AS all_keys
FROM m
""",
)
def map_functions_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build a map from aggregated keys/values, element
    access, cardinality, sorted key list (generalizes B7's
    manufacturer-data map extraction, ``scanner.rs:179-181``)."""
    r = load(spark, sf_dir, "region")
    m = r.agg(
        F.map_from_arrays(
            F.collect_list("r_name"), F.collect_list(F.col("r_regionkey").cast("long"))
        ).alias("rm")
    )
    return m.select(
        F.lit("ASIA").alias("key_name"),
        F.col("rm")["ASIA"].alias("asia_key"),
        F.size("rm").alias("n_keys"),
        F.sort_array(F.map_keys("rm")).alias("all_keys"),
    )


@query(
    "string_pad_case_like",
    oracle="""
SELECT s_suppkey,
       lpad(CAST(s_suppkey AS VARCHAR), 8, '0') AS padded_key,
       CAST(s_name LIKE 'Supplier%' AS BOOLEAN) AS is_supplier,
       CAST(regexp_matches(s_name, '[0-9]$') AS BOOLEAN) AS ends_digit,
       replace(lower(s_name), '#', '-') AS slug,
       CAST(length(trim('  ' || s_name || '  ')) AS INTEGER)
           AS trimmed_len
FROM supplier
""",
)
def string_pad_case_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String wave 2: lpad, LIKE, regex match, translate-style replace,
    trim composition."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.lpad(F.col("s_suppkey").cast("string"), 8, "0").alias("padded_key"),
        F.col("s_name").like("Supplier%").alias("is_supplier"),
        F.col("s_name").rlike("[0-9]$").alias("ends_digit"),
        F.replace(F.lower("s_name"), F.lit("#"), F.lit("-")).alias("slug"),
        F.length(F.trim(F.concat(F.lit("  "), F.col("s_name"), F.lit("  "))))
        .alias("trimmed_len"),
    )


@query(
    "minmax_by_direct",
    oracle="""
SELECT o_orderstatus,
       MAX_BY(o_orderkey, o_totalprice) AS priciest_order,
       MIN_BY(o_orderkey, o_totalprice) AS cheapest_order,
       ROUND(MAX(o_totalprice), 2) AS max_price
FROM orders
GROUP BY o_orderstatus
""",
)
def minmax_by_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by as first-class aggregates (the deterministic
    replacement for the reference's arrival-order first/last, §4.2.2).
    o_totalprice is unique enough at 2 decimals over 15k orders that
    both engines pick the same argmax (ties would be engine-defined)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@query(
    "boolean_aggregates",
    oracle="""
SELECT l_returnflag,
       CAST(bool_and(l_quantity > 0) AS BOOLEAN) AS all_positive_qty,
       CAST(bool_or(l_discount > 0.09) AS BOOLEAN) AS any_deep_discount,
       CAST(COUNT(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_untaxed
FROM lineitem
GROUP BY l_returnflag
""",
)
def boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """every/any boolean aggregates + count_if."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.every(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.some(F.col("l_discount") > 0.09).alias("any_deep_discount"),
        F.count_if(F.col("l_tax") == 0).alias("n_untaxed"),
    )


@query(
    "bitwise_ops_events",
    oracle="""
SELECT event_id,
       CAST(event_id & 255 AS BIGINT) AS low_byte,
       CAST(event_id | 4096 AS BIGINT) AS with_flag,
       CAST(xor(event_id, 255) AS BIGINT) AS xored,
       CAST(event_id >> 4 AS BIGINT) AS shifted,
       CAST(bit_count(event_id) AS INTEGER) AS popcount
FROM events WHERE event_id < 2000
""",
)
def bitwise_ops_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family: and/or/xor/shift/popcount (the machinery behind
    SimHash banding, exposed as a query)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(4096)).alias("with_flag"),
        F.col("event_id").bitwiseXOR(F.lit(255)).alias("xored"),
        F.shiftright("event_id", 4).alias("shifted"),
        F.bit_count("event_id").alias("popcount"),
    )


@query(
    "explode_sequence_join",
    oracle="""
WITH months AS (
    SELECT r_regionkey, UNNEST(generate_series(1, 3)) AS m
    FROM region
)
SELECT r.r_name, m.m,
       CAST(r.r_regionkey * 100 + m.m AS BIGINT) AS slot
FROM months m JOIN region r ON r.r_regionkey = m.r_regionkey
""",
)
def explode_sequence_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator shape: sequence() + explode fans each row out (the
    UDTF-equivalent), then joins back — the dimension-densification
    pattern (calendar/backfill joins)."""
    r = load(spark, sf_dir, "region")
    months = r.select(
        "r_regionkey", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("m")
    )
    return months.join(F.broadcast(r), "r_regionkey").select(
        "r_name",
        "m",
        (F.col("r_regionkey").cast("long") * 100 + F.col("m")).alias("slot"),
    )


@query(
    "union_distinct_priorities",
    oracle="""
SELECT o_orderpriority AS priority FROM orders WHERE o_orderstatus = 'F'
UNION
SELECT o_orderpriority FROM orders WHERE o_totalprice > 400000
""",
)
def union_distinct_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — completes the set-op family (§2.1 set ops;
    UNION ALL / INTERSECT / EXCEPT covered by set_ops_user_cohorts)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("priority")
    )
    b = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderpriority").alias("priority")
    )
    return a.union(b).distinct()
