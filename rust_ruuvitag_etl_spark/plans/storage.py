"""Storage-layout queries: the on-disk physical design levers a 100 TB
deployment lives by — directory partitioning (partition pruning) and
bucketing (shuffle-free joins) — exercised as oracle-checked registry
queries over layouts the engine builds itself (once, idempotently, under
the repo-local warehouse).

These prove the SINK side of the engine end to end: write a layout,
read it back through the layout's access path, and hash-match the
result against the oracle computed from the original table.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load
from ..sources.sinks import write_bucketed, write_parquet
from .registry import query


def _warehouse() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "spark-warehouse",
    )


def _slug(sf_dir: str) -> str:
    return re.sub(r"[^0-9A-Za-z]+", "_", sf_dir).strip("_")


@query(
    "partitioned_scan_pruned",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type = 'purchase' AND value IS NOT NULL
GROUP BY user_id
""",
)
def partitioned_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition pruning end to end: events written ONCE partitioned by
    event_type (the directory layout IS the index — at 100 TB,
    `event_type=purchase/` is the only subtree this query's scan ever
    lists), then the per-user purchase rollup reads back through the
    partition filter. The oracle computes the same answer from the
    unpartitioned original, so the layout round-trip is hash-verified;
    tests/test_plan_posture.py asserts the filter lands in
    PartitionFilters, not post-scan."""
    path = os.path.join(_warehouse(), f"events_by_type_{_slug(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_parquet(
            load(spark, sf_dir, "events"),
            path,
            mode="overwrite",
            partition_by=("event_type",),
        )
    ev = spark.read.parquet(path)
    return (
        ev.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "bucketed_join_colocated",
    oracle="""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""",
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact-to-fact join via bucketing: lineitem and orders
    each written ONCE bucketed (and sorted) by orderkey into 8 matching
    buckets — the persisted hash-partitioning lets the join run as a
    per-bucket sort-merge with ZERO exchange on either side (the
    posture test asserts no shuffle under the join). At 100 TB this is
    the difference between the nightly fact join being a full-cluster
    shuffle and a local merge. Result hash-matched against the plain
    join oracle."""
    slug = _slug(sf_dir)
    lt, ot = f"lineitem_bkt_{slug}", f"orders_bkt_{slug}"
    if not spark.catalog.tableExists(lt):
        write_bucketed(
            load(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_extendedprice", "l_discount"
            ),
            lt,
            bucket_cols=("l_orderkey",),
            num_buckets=8,
            sort_cols=("l_orderkey",),
            path=os.path.join(_warehouse(), lt),
        )
    if not spark.catalog.tableExists(ot):
        write_bucketed(
            load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
            ot,
            bucket_cols=("o_orderkey",),
            num_buckets=8,
            sort_cols=("o_orderkey",),
            path=os.path.join(_warehouse(), ot),
        )
    li, o = spark.table(lt), spark.table(ot)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@query(
    "orc_roundtrip_supplier",
    oracle="""
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
       MAX(s_name) AS max_name
FROM supplier
GROUP BY s_nationkey
""",
)
def orc_roundtrip_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second columnar format, round-tripped: supplier written ONCE as
    ORC (Spark's other first-class columnar source — same predicate
    pushdown / column pruning machinery as parquet), read back through
    the ORC reader, aggregated per nation, and hash-matched against the
    oracle computed from the parquet original — proving the engine's
    values survive a cross-format round trip bit-for-bit (decimal-exact
    sums; doubles re-emerge identical because ORC stores IEEE doubles
    losslessly)."""
    path = os.path.join(_warehouse(), f"supplier_orc_{_slug(sf_dir)}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        load(spark, sf_dir, "supplier").write.mode("overwrite").orc(path)
    s = spark.read.orc(path)
    return s.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_bal"),
        F.max("s_name").alias("max_name"),
    )
