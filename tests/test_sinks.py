"""Sink round-trip tests: parquet (plain/partitioned/dynamic-overwrite),
CSV and JSON, plus the JDBC writer's option wiring (no database in the
container — the writer is inspected, not saved)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.sources import load, sinks

from .conftest import SF_SMALL


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sink_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


class TestParquetSink:
    def test_roundtrip(self, spark, tmpdir):
        src = load(spark, SF_SMALL, "orders")
        sinks.write_parquet(src, f"{tmpdir}/plain", mode="overwrite")
        back = spark.read.parquet(f"{tmpdir}/plain")
        assert back.count() == src.count()
        assert set(back.columns) == set(src.columns)

    def test_partitioned_layout_prunes(self, spark, tmpdir):
        src = load(spark, SF_SMALL, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )
        sinks.write_parquet(
            src, f"{tmpdir}/byyear", mode="overwrite", partition_by=("order_year",)
        )
        back = spark.read.parquet(f"{tmpdir}/byyear")
        one_year = back.filter(F.col("order_year") == 1996)
        plan = one_year._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan  # pruning pushed to the scan
        assert one_year.count() == src.filter(F.year("o_orderdate") == 1996).count()

    def test_dynamic_partition_overwrite_is_idempotent(self, spark, tmpdir):
        src = load(spark, SF_SMALL, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        )
        path = f"{tmpdir}/dyn"
        sinks.write_parquet(src, path, mode="overwrite", partition_by=("order_year",))
        before = spark.read.parquet(path).count()
        # Re-writing the same slice must replace, not duplicate (S2 parity)
        slice_1996 = src.filter(F.col("order_year") == 1996)
        sinks.overwrite_partitions(slice_1996, path, ("order_year",))
        after = spark.read.parquet(path).count()
        assert after == before

    def test_pipeline_output_sink(self, spark, tmpdir):
        """P1+S1: the two split projections write to two tables."""
        from rust_ruuvitag_etl_spark.operators import ruuvi_pipeline as rp

        from .fixtures import RAW_SCHEMA, TAGS, TAGS_SCHEMA, raw_adverts_rows

        raw = spark.createDataFrame(raw_adverts_rows(), RAW_SCHEMA)
        tags = spark.createDataFrame(TAGS, TAGS_SCHEMA)
        sensor_data, movement_data = rp.ruuvi_batch_pipeline(raw, tags)
        sinks.write_parquet(sensor_data, f"{tmpdir}/sensor_data", mode="overwrite")
        sinks.write_parquet(movement_data, f"{tmpdir}/movement_data", mode="overwrite")
        s = spark.read.parquet(f"{tmpdir}/sensor_data")
        m = spark.read.parquet(f"{tmpdir}/movement_data")
        assert s.count() == m.count() > 0


class TestTextSinks:
    def test_csv_roundtrip(self, spark, tmpdir):
        src = load(spark, SF_SMALL, "nation")
        sinks.write_csv(src, f"{tmpdir}/csv")
        back = (
            spark.read.option("header", "true")
            .schema(src.schema)
            .csv(f"{tmpdir}/csv")
        )
        assert sorted(r["n_name"] for r in back.collect()) == sorted(
            r["n_name"] for r in src.collect()
        )

    def test_json_roundtrip(self, spark, tmpdir):
        src = load(spark, SF_SMALL, "region")
        sinks.write_json(src, f"{tmpdir}/json")
        back = spark.read.schema(src.schema).json(f"{tmpdir}/json")
        assert back.count() == src.count()


class TestJdbcWriter:
    def test_options_wired(self, spark):
        src = load(spark, SF_SMALL, "region")
        w = sinks.jdbc_writer(
            src,
            url="jdbc:postgresql://db.example:5432/sensors",
            table="sensor_data",
            ssl_root_cert="/certs/ca.pem",
        )
        assert w is not None  # construction succeeds without a database

    def test_live_roundtrip_embedded_derby(self, spark, tmpdir):
        """The JDBC writer exercised against a REAL SQL database: Apache
        Derby ships with the Spark distribution (embedded JDBC driver),
        so the reference's S1 INSERT path (`operations.rs:17-90`) runs
        end-to-end — batched INSERTs through Spark's JDBC sink into a
        real engine, then read back through the JDBC source and compared
        row-for-row. (PostgreSQL+TLS itself still needs a live server;
        the TLS option wiring is covered above.)"""
        url = f"jdbc:derby:{tmpdir}/sensordb;create=true"
        driver = "org.apache.derby.jdbc.EmbeddedDriver"
        from rust_ruuvitag_etl_spark.plans import REGISTRY

        for table, query in (
            ("sensor_data", "ruuvi_sensor_output"),
            ("movement_data", "ruuvi_movement_output"),
        ):
            out = REGISTRY[query].fn(spark, SF_SMALL)
            sinks.jdbc_writer(out, url, table).option("driver", driver).save()
            back = (
                spark.read.format("jdbc")
                .option("url", url)
                .option("dbtable", table)
                .option("driver", driver)
                .load()
            )
            cols = sorted(out.columns)
            want = sorted(map(tuple, out.select(*cols).collect()))
            got = sorted(map(tuple, back.select(*cols).collect()))
            assert got == want, table
            # append mode must append, not replace (the reference's
            # periodic INSERT cadence, main.rs:114-121)
            sinks.jdbc_writer(out, url, table).option("driver", driver).save()
            assert (
                spark.read.format("jdbc")
                .option("url", url).option("dbtable", table)
                .option("driver", driver).load().count()
                == 2 * out.count()
            )


class TestFormatSources:
    """CSV/JSON readers (sources/tables.py load_csv/load_json): declared
    schema, FAILFAST on malformed rows."""

    def test_csv_source_roundtrip(self, spark, tmpdir):
        from rust_ruuvitag_etl_spark.sources import load_csv

        src = load(spark, SF_SMALL, "customer")
        sinks.write_csv(src, f"{tmpdir}/c")
        back = load_csv(spark, f"{tmpdir}/c", src.schema)
        assert back.schema == src.schema
        assert sorted(r["c_custkey"] for r in back.collect()) == sorted(
            r["c_custkey"] for r in src.collect()
        )

    def test_json_source_roundtrip(self, spark, tmpdir):
        from rust_ruuvitag_etl_spark.sources import load_json

        src = load(spark, SF_SMALL, "orders")
        sinks.write_json(src, f"{tmpdir}/j")
        back = load_json(spark, f"{tmpdir}/j", src.schema)
        assert back.count() == src.count()
        a = back.agg(F.sum("o_totalprice")).head()[0]
        b = src.agg(F.sum("o_totalprice")).head()[0]
        assert abs(a - b) < 1e-6

    def test_csv_failfast_rejects_malformed(self, spark, tmpdir):
        import pyspark.sql.types as T
        from rust_ruuvitag_etl_spark.sources import load_csv

        p = f"{tmpdir}/bad.csv"
        with open(p, "w") as fh:
            fh.write("k,v\n1,a\nnot_an_int,b\n")
        schema = T.StructType(
            [T.StructField("k", T.IntegerType()), T.StructField("v", T.StringType())]
        )
        import pytest as _pt

        with _pt.raises(Exception):
            load_csv(spark, str(p), schema).collect()


class TestCompaction:
    def test_compact_preserves_data_and_reduces_files(self, spark, tmp_path):
        import os

        from rust_ruuvitag_etl_spark.sources.sinks import compact_parquet

        path = str(tmp_path / "shattered")
        df = spark.range(10_000).selectExpr("id", "id % 7 AS k")
        df.repartition(32).write.parquet(path)  # 32 tiny files
        before = sum(
            1 for _, _, fs in os.walk(path) for f in fs if f.endswith(".parquet")
        )
        assert before >= 32
        after = compact_parquet(spark, path, target_file_bytes=1 << 30)
        assert after < before and after >= 1
        got = spark.read.parquet(path)
        assert got.count() == 10_000
        assert got.agg({"id": "sum"}).head()[0] == sum(range(10_000))
