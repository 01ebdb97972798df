"""Sink layer (reference ops S1/S2/S3 re-expressed,
``/root/reference/src/database/operations.rs:17-90`` and
``connection.rs:18-134``).

The reference row-inserts each aggregate into PostgreSQL over TLS with
a 100×5s retry loop. Spark-first replacements:

- **Parquet append** (native target per BASELINE.json): bulk columnar
  write, optionally partitioned — at 100 TB the partition columns ARE
  the retention/pruning strategy (date first, then coarse key).
- **JDBC batch append** for literal parity: set-oriented batched
  INSERTs replace per-row statements; ``sslmode``/``sslrootcert``
  options replace the hand-rolled TLS connector (S3).
- **Retry** (S2) is not user code anymore: task-level retries
  (``spark.task.maxFailures``) plus idempotent overwrite-by-partition
  give at-least-once with effective exactly-once per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Native sink. ``partition_by`` defines the directory layout a
    100 TB table needs for partition pruning (e.g. ('day', 'sensor_group'));
    writers produce one file per task per partition — repartition on the
    partition columns upstream to avoid the many-small-files failure mode."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: tuple[str, ...]) -> None:
    """Idempotent re-run sink: dynamic partition overwrite replaces only
    the partitions present in ``df`` — the replay-safe replacement for
    the reference's blind retry loop (S2)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    batchsize: int = 10_000,
    ssl_root_cert: str | None = None,
    mode: str = "append",
):
    """JDBC sink configured like the reference's TLS PostgreSQL path
    (S1+S3): batched inserts (vs per-row ``operations.rs:31``),
    ``sslrootcert`` verify-ca semantics (``connection.rs:18-38``).
    Returns the configured writer; caller invokes ``.save()`` (kept
    separate so tests can inspect options without a database)."""
    writer = (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "READ_COMMITTED")
    )
    if ssl_root_cert is not None:
        writer = (
            writer.option("sslmode", "verify-ca")
            .option("sslrootcert", ssl_root_cert)
        )
    return writer


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export sink (header on; UTC timestamps)."""
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines export sink."""
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 16,
    sort_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Bucketed managed-table sink (``bucketBy`` + ``saveAsTable``).

    Bucketing persists a hash-partitioning ON DISK: two tables bucketed
    the same way on the join key sort-merge-join with ZERO shuffle on
    either side — at 100 TB this turns the nightly fact-to-fact join
    from the dominant shuffle into a local merge (verified by
    tests/test_bucketed.py asserting no Exchange under the join). Spark
    cannot bucket a path-based ``parquet(path)`` write; the table
    catalog carries the bucket spec.

    ``path`` makes the table external at that location (the catalog
    still carries the bucket spec) — callers that must control where
    files land (e.g. a repo-local warehouse) pass it explicitly."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 1,
) -> int:
    """Small-file compaction — the nightly maintenance job every 100 TB
    parquet lake runs. Streaming appends, per-task writers, and dynamic
    partition overwrites all accumulate files far below the optimal
    scan granule; a directory of 10k x 1 MB files costs 10k task
    startups and NameNode/listing pressure where ~80 x 128 MB files
    scan in a handful of waves.

    Reads the directory, coalesces to ceil(total_bytes /
    target_file_bytes) output files (never below ``min_files``), and
    near-atomically replaces via write-to-temp + two renames. NOT truly
    atomic: between the two ``os.rename`` calls the dataset path briefly
    does not exist, so a concurrent reader can error (and plain rename
    only works on a local POSIX filesystem — object stores need a
    manifest/table-format commit for a real atomic swap). Returns the
    new file count. ``coalesce`` (not ``repartition``): compaction must
    not pay a shuffle — it only narrows the writer parallelism.
    """
    import math
    import os
    import shutil
    import uuid

    df = spark.read.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(dirpath, f))
        for dirpath, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_out = max(min_files, math.ceil(total / target_file_bytes))
    tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
    old = f"{path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for _, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def register_external_table(
    spark,
    table: str,
    path: str,
    bucket_cols: tuple[str, ...] = (),
    num_buckets: int = 0,
    sort_cols: tuple[str, ...] = (),
) -> bool:
    """Re-register an already-materialized table path in THIS session's
    catalog instead of rebuilding it.

    The build-once index accessors (IVF/PQ/SQ8) guard on
    ``spark.catalog.tableExists`` — but the default catalog is
    per-process, so a second process (or a restart) would rebuild and
    OVERWRITE index files a concurrent session may be mid-read on.
    If Spark's ``_SUCCESS`` marker shows the path is complete, this
    recreates the catalog entry — including the bucket spec, which a
    plain ``spark.read.parquet(path)`` would lose, and which the probe
    plans rely on for shuffle-free equi-joins — and returns True.
    Returns False when there is nothing on disk (caller builds)."""
    import os

    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        return False
    schema = spark.read.parquet(path).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    ddl = f"CREATE TABLE {table} ({cols}) USING parquet"
    if bucket_cols:
        ddl += f" CLUSTERED BY ({', '.join(bucket_cols)})"
        if sort_cols:
            ddl += f" SORTED BY ({', '.join(sort_cols)})"
        ddl += f" INTO {num_buckets} BUCKETS"
    ddl += f" LOCATION '{path}'"
    spark.sql(ddl)
    return True
