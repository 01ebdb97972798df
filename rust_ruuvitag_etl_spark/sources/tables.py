"""Parquet source layer: schema registry + loaders for the test tables.

The reference hard-codes its schemas as Rust structs
(``/root/reference/src/models.rs:8-35``) and rejects malformed input at
the source (``/root/reference/src/bluetooth/scanner.rs:36-45``). The
Spark analog is an explicit, declared schema per table — never inferred —
so analysis errors surface at plan time and the parquet reader prunes
columns/pushes filters against a known layout.

Scale notes (100 TB): a production deployment would partition ``events``
by date and bucket ``lineitem``/``orders`` by their join keys; here the
loader is a plain ``spark.read.parquet`` so Catalyst's own pushdown and
pruning do the work, and all queries go through this single entry point
so a partitioned layout later is a one-line change.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Explicit schemas for every driver table (FIXTURES.md §B). Events.ts is
# declared long here because the files carry TIMESTAMP(NANOS); the
# loader converts to a proper timestamp column.
SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # ts physical type varies by testdata generation (see
            # events_read_schema): TIMESTAMP(NANOS) read as long under
            # the legacy conf, or a plain µs-precision timestamp.
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLES: tuple[str, ...] = tuple(SCHEMAS)

# Tables small enough to always broadcast in joins (dimension side).
DIM_TABLES: frozenset[str] = frozenset({"region", "nation", "supplier"})


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass


# Footer-probed ts dataType per events file path. The driver has shipped
# events.parquet both ways across rounds — TIMESTAMP(NANOS) (reads as
# long under the legacy conf) and plain µs TIMESTAMP/TIMESTAMP_NTZ — so
# the loader probes the footer once per (path, mtime) instead of
# assuming. The mtime key invalidates the cache when the driver
# regenerates the file at the same path mid-process.
_EVENTS_TS_TYPE: dict[tuple[str, float], T.DataType] = {}


def _events_mtime(path: str) -> float:
    """Latest mtime under ``path`` (parquet may be a file or a
    directory of part files); 0.0 for non-local paths we can't stat."""
    try:
        if os.path.isdir(path):
            times = [os.path.getmtime(path)]
            for entry in os.scandir(path):
                times.append(entry.stat().st_mtime)
            return max(times)
        return os.path.getmtime(path)
    except OSError:
        return 0.0


def _events_ts_type(spark: SparkSession, path: str) -> T.DataType:
    # The nanos conf is per-session SQLConf: set it unconditionally so a
    # SECOND SparkSession hitting a warm cache still gets the legacy
    # conf it needs to read a TIMESTAMP(NANOS) file as long.
    _ensure_nanos_conf(spark)
    key = (path, _events_mtime(path))
    if key not in _EVENTS_TS_TYPE:
        _EVENTS_TS_TYPE[key] = spark.read.parquet(path).schema["ts"].dataType
    return _EVENTS_TS_TYPE[key]


def events_read_schema(spark: SparkSession, path: str) -> T.StructType:
    """The declared read schema for this events file: the registry schema
    with ``ts`` swapped to the footer's physical type (long for nanos
    files, timestamp/timestamp_ntz for µs files). Schema stays explicit —
    the probe reads only the footer, never infers other columns."""
    ts_type = _events_ts_type(spark, path)
    return T.StructType(
        [
            T.StructField("ts", ts_type) if f.name == "ts" else f
            for f in SCHEMAS["events"]
        ]
    )


def events_ts_expr(spark: SparkSession, path: str) -> F.Column:
    """Expression normalizing the raw ``ts`` column to a session-TZ
    TimestampType. Nanos files: integer ``div`` 1000 then
    timestamp_micros — integer div, NOT ``/``, because float division of
    epoch-nanos exceeds double's 2^53 exact range and corrupts the low
    digits (the truncation matches DuckDB's µs-precision TIMESTAMP).
    µs files: a plain cast (no-op arithmetic; session TZ is UTC)."""
    if isinstance(_events_ts_type(spark, path), T.LongType):
        return F.timestamp_micros(F.expr("ts div 1000"))
    return F.col("ts").cast("timestamp")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from ``{sf_dir}/{name}.parquet`` with its declared schema."""
    if name not in SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(SCHEMAS)}")
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        df = spark.read.schema(events_read_schema(spark, path)).parquet(path)
        return df.withColumn("ts", events_ts_expr(spark, path))
    return spark.read.schema(SCHEMAS[name]).parquet(path)


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV scan with mandatory declared schema (never inferred — schema
    inference triggers an extra full pass over the data and guesses
    types; at 100 TB both are unacceptable). ``FAILFAST`` mirrors the
    reference's reject-malformed-input stance
    (``/root/reference/src/bluetooth/scanner.rs:36-45``); pass
    ``mode='DROPMALFORMED'`` for the quarantine-style pipeline."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .csv(path)
    )


def load_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    mode: str = "FAILFAST",
) -> DataFrame:
    """JSON-lines scan with mandatory declared schema; same
    reject-malformed stance as :func:`load_csv`."""
    return spark.read.schema(schema).option("mode", mode).json(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` passthrough
    works against the same sources as the DataFrame API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
