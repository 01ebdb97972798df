"""Fourth-wave tests: unpivot, deterministic hash sampling, null-safe
join, salted skew aggregation, applyInPandas grouped delta, bucketed
join locality, stateful streaming monitor."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.operators import skew
from rust_ruuvitag_etl_spark.plans import REGISTRY
from rust_ruuvitag_etl_spark.sources import load, sinks

from .conftest import SF_SMALL


class TestUnpivot:
    def test_row_multiplicity_and_values(self, spark):
        out = REGISTRY["unpivot_part_measures"].fn(spark, SF_SMALL)
        n_part = load(spark, SF_SMALL, "part").count()
        assert out.count() == 2 * n_part
        one = (
            out.filter(F.col("p_partkey") == 1)
            .orderBy("measure")
            .collect()
        )
        p1 = load(spark, SF_SMALL, "part").filter(F.col("p_partkey") == 1).head()
        by_measure = {r["measure"]: r["value"] for r in one}
        assert by_measure["p_size"] == float(p1["p_size"])
        assert by_measure["p_retailprice"] == pytest.approx(p1["p_retailprice"])


class TestHashSample:
    def test_deterministic_across_runs(self, spark):
        a = REGISTRY["sample_hash_deterministic"].fn(spark, SF_SMALL).collect()
        b = REGISTRY["sample_hash_deterministic"].fn(spark, SF_SMALL).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_sample_fraction_near_quarter(self, spark):
        o = load(spark, SF_SMALL, "orders")
        sampled_n = sum(
            r["n_sampled"]
            for r in REGISTRY["sample_hash_deterministic"].fn(spark, SF_SMALL).collect()
        )
        frac = sampled_n / o.count()
        assert 0.15 < frac < 0.35  # 25% expected; small-sf variance


class TestNullSafeJoin:
    def test_null_key_row_present(self, spark):
        rows = REGISTRY["join_null_safe"].fn(spark, SF_SMALL).collect()
        ets = {r["et"] for r in rows}
        assert None in ets  # the nulled-out 'error' bucket joined
        for r in rows:
            assert r["n_even"] > 0 and r["n_odd"] > 0


class TestSaltedAgg:
    def test_equals_direct_aggregation(self, spark):
        li = load(spark, SF_SMALL, "lineitem").withColumn(
            "l_quantity", F.col("l_quantity").cast("bigint")
        )
        direct = {
            r["l_suppkey"]: (r["s"], r["n"])
            for r in li.groupBy("l_suppkey")
            .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        }
        salted = {
            r["l_suppkey"]: (r["sum_l_quantity"], r["n"])
            for r in skew.salted_sum_count(
                li, "l_suppkey", "l_quantity", "l_orderkey", n_salts=8
            ).collect()
        }
        assert salted == direct

    def test_two_shuffles_in_plan(self, spark):
        li = load(spark, SF_SMALL, "lineitem")
        plan = skew.salted_sum_count(
            li, "l_suppkey", "l_quantity", "l_orderkey"
        )._jdf.queryExecution().optimizedPlan().toString()
        # two logical Aggregates: partial over (key, salt), final over key
        assert plan.count("Aggregate") >= 2

    def test_salted_join_rejects_outer_types(self, spark):
        """right/full outer would emit unmatched medium-side rows once
        per salt — the operator must refuse, not silently duplicate."""
        import pytest

        li = load(spark, SF_SMALL, "lineitem")
        o = load(spark, SF_SMALL, "orders")
        for how in ("right", "full", "full_outer"):
            with pytest.raises(ValueError, match="salted_shuffle_join"):
                skew.salted_shuffle_join(
                    li, o, "l_orderkey", "l_partkey", how=how
                )


class TestApplyInPandasDelta:
    def test_matches_expression_version(self, spark):
        exp = {
            (r["user_id"], r["window_start"]): r["movement_delta"]
            for r in REGISTRY["ruuvi_movement_delta"].fn(spark, SF_SMALL).collect()
        }
        pand = {
            (r["user_id"], r["window_start"]): r["movement_delta"]
            for r in REGISTRY["ruuvi_movement_delta_pandas"]
            .fn(spark, SF_SMALL)
            .collect()
        }
        assert pand == exp


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark):
        wh = tempfile.mkdtemp(prefix="bucket_wh_")
        try:
            o = load(spark, SF_SMALL, "orders")
            c = load(spark, SF_SMALL, "customer")
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_customer")
            sinks.write_bucketed(
                o, "b_orders", ("o_custkey",), num_buckets=8, sort_cols=("o_custkey",)
            )
            sinks.write_bucketed(
                c, "b_customer", ("c_custkey",), num_buckets=8, sort_cols=("c_custkey",)
            )
            bo = spark.table("b_orders")
            bc = spark.table("b_customer")
            # disable broadcast so the co-located sort-merge path is chosen
            with_conf = spark.conf
            old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                joined = bo.join(bc, bo["o_custkey"] == bc["c_custkey"]).select(
                    "o_orderkey", "c_name"
                )
                physical = joined._jdf.queryExecution().executedPlan().toString()
                assert "Exchange" not in physical, physical
                # and it still computes the right thing
                plain = o.join(c, o["o_custkey"] == c["c_custkey"]).count()
                assert joined.count() == plain
            finally:
                with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        finally:
            spark.sql("DROP TABLE IF EXISTS b_orders")
            spark.sql("DROP TABLE IF EXISTS b_customer")
            shutil.rmtree(wh, ignore_errors=True)


class TestStatefulMonitor:
    def test_cumulative_state_across_batches(self, spark):
        from rust_ruuvitag_etl_spark.streaming import pipeline as sp
        from rust_ruuvitag_etl_spark.streaming.stateful import sensor_monitor_stream

        from .fixtures import READINGS_SCHEMA, readings_rows

        d = tempfile.mkdtemp(prefix="monitor_stream_")
        try:
            df = spark.createDataFrame(readings_rows(), READINGS_SCHEMA)
            df.coalesce(1).write.mode("overwrite").parquet(d)
            stream = sp.read_readings_stream(spark, d, READINGS_SCHEMA)
            mon = sensor_monitor_stream(stream)
            q = (
                mon.writeStream.format("memory")
                .queryName("monitor_out")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # last update per sensor must equal the batch-computed totals
            out = spark.sql(
                """
                SELECT * FROM (
                  SELECT *, row_number() OVER (
                    PARTITION BY sensor_mac ORDER BY total_readings DESC) rn
                  FROM monitor_out) WHERE rn = 1
                """
            ).collect()
            batch = {
                r["sensor_mac"]: (r["n"], r["mean_t"])
                for r in df.groupBy("sensor_mac")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.round(F.avg("temperature"), 2).alias("mean_t"),
                )
                .collect()
            }
            assert out, "no monitor output"
            for r in out:
                n, mean_t = batch[r["sensor_mac"]]
                assert r["total_readings"] == n
                assert r["running_mean_temp"] == pytest.approx(mean_t, abs=0.01)
        finally:
            shutil.rmtree(d, ignore_errors=True)


class TestScd2PointInTime:
    def test_no_fanout_and_no_future_leak(self, spark):
        """Every purchase appears exactly once (segments partition the
        timeline — the join cannot fan out), and any attributed
        segment began at or before the probe's as-of instant (no
        future state leaks into the attribution)."""
        import datetime as dt

        from rust_ruuvitag_etl_spark.plans.relational8 import (
            scd2_point_in_time_join,
        )
        from rust_ruuvitag_etl_spark.sources import load

        sf = "/root/testdata/sf0.001"
        got = scd2_point_in_time_join(spark, sf).collect()
        n_purchases = (
            load(spark, sf, "events")
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        assert len(got) == n_purchases
        assert len({r["event_id"] for r in got}) == n_purchases
        one_h = dt.timedelta(hours=1)
        n_attr = 0
        for r in got:
            if r["attributed_state"] is not None:
                n_attr += 1
                assert r["state_since"] <= r["ts"] - one_h
        assert 0 < n_attr  # the corpus spans a month: most probes hit


class TestBacklogAndBasket:
    def test_backlog_invariants(self, spark):
        """The sweep-line curve: backlog is exactly the running sum
        of deltas and ends at zero (every line both opens and ships
        inside the horizon). The synthetic corpus contains ship-
        before-order lines, so the curve legitimately dips negative —
        that dip IS the sweep-line's data-quality signal (a causality
        violation a DQ suite would flag), so the test asserts the
        identity, not non-negativity."""
        from rust_ruuvitag_etl_spark.plans.relational8 import (
            orders_open_backlog_curve,
        )

        rows = sorted(
            orders_open_backlog_curve(
                spark, "/root/testdata/sf0.001"
            ).collect(),
            key=lambda r: r["day"],
        )
        assert len(rows) > 100
        run = 0
        for r in rows:
            run += r["opened"] - r["shipped"]
            assert r["backlog"] == run
        total_opened = sum(r["opened"] for r in rows)
        total_shipped = sum(r["shipped"] for r in rows)
        assert total_opened == total_shipped  # every line ships
        assert rows[-1]["backlog"] == 0

    def test_basket_measures_consistent(self, spark):
        """lift = conf_a_to_b / (n_b / N): cross-check each rule's
        measures against its integer counts."""
        from rust_ruuvitag_etl_spark.plans.relational8 import (
            market_basket_rules,
        )
        from rust_ruuvitag_etl_spark.sources import load

        sf = "/root/testdata/sf0.001"
        n = (
            load(spark, sf, "lineitem")
            .select("l_orderkey")
            .distinct()
            .count()
        )
        rows = market_basket_rules(spark, sf).collect()
        assert len(rows) > 0
        for r in rows[:200]:
            assert r["n_ab"] >= 2
            assert r["part_a"] < r["part_b"]
            assert abs(r["support"] - round(r["n_ab"] / n, 6)) < 1e-9
            assert (
                abs(r["conf_a_to_b"] - round(r["n_ab"] / r["n_a"], 6))
                < 1e-9
            )
            lift = r["n_ab"] * n / (r["n_a"] * r["n_b"])
            assert abs(r["lift"] - round(lift, 6)) < 1e-9
