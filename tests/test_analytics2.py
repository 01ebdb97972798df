"""Semantics tests for plans/analytics2.py: the data-quality constraint
suite on a warehouse with PLANTED violations of every kind, and the
EWMA smoother's exact weighting/renormalization on a hand-built series.
The registry-level differential (test_registry) separately hash-checks
both queries against DuckDB on the driver testdata.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.plans.analytics2 import (
    dq_constraint_checks,
    timeseries_ewma_smooth,
)


def _t(minute, second=0):
    return dt.datetime(2024, 3, 4, 10, minute, second)


def _write(df, tmp_path, name):
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/{name}.parquet")


class TestDqConstraints:
    def _build_warehouse(self, spark, tmp_path):
        orders = spark.createDataFrame(
            [
                # one NULL custkey (completeness violation), one
                # duplicated orderkey (uniqueness violation), one bad
                # status 'X' (accepted-values violation)
                (1, 10, "O", 100.0, _t(0), "1-URGENT"),
                (2, None, "F", 200.0, _t(1), "2-HIGH"),
                (3, 30, "P", 300.0, _t(2), "3-MEDIUM"),
                (3, 30, "X", 300.0, _t(3), "3-MEDIUM"),
            ],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        )
        lineitem = spark.createDataFrame(
            [
                # orderkey 99 is an orphan (RI violation); discount 1.5
                # is out of [0,1] (range violation)
                (1, 1, 1, 1, 1.0, 10.0, 0.05, 0.01, "N", "O", _t(0)),
                (99, 1, 1, 1, 1.0, 10.0, 1.5, 0.01, "N", "O", _t(1)),
            ],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate timestamp",
        )
        customer = spark.createDataFrame(
            [(10, "a", 1, 50.0, "BUILDING"), (30, "b", 1, -5.0, "AUTOMOBILE")],
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
        )
        events = spark.createDataFrame(
            [
                # user 7 emits two events at the SAME timestamp
                (1, _t(0), 7, "view", 1.0, "{}"),
                (2, _t(0), 7, "click", 1.0, "{}"),
                (3, _t(1), 8, "view", 1.0, "{}"),
            ],
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        for df, name in [
            (orders, "orders"),
            (lineitem, "lineitem"),
            (customer, "customer"),
            (events, "events"),
        ]:
            _write(df, tmp_path, name)
        return str(tmp_path)

    def test_every_violation_kind_is_caught(self, spark, tmp_path):
        sf_dir = self._build_warehouse(spark, tmp_path)
        got = {
            r["check_name"]: (r["metric"], r["passed"])
            for r in dq_constraint_checks(spark, sf_dir).collect()
        }
        assert got["completeness_o_custkey"] == (0.75, False)
        assert got["uniqueness_o_orderkey"] == (0.75, False)
        assert got["ri_lineitem_orderkey"] == (0.5, False)
        assert got["range_l_discount_0_1"] == (0.5, False)
        assert got["accepted_values_o_orderstatus"] == (0.75, False)
        assert got["range_c_acctbal_nonneg"] == (0.5, False)
        # 2 distinct (user, ts) pairs over 3 events
        assert got["uniqueness_events_user_ts"][1] is False
        assert abs(got["uniqueness_events_user_ts"][0] - 2 / 3) < 1e-6

    def test_clean_warehouse_passes_everything(self, spark, tmp_path):
        sf_dir = self._build_warehouse(spark, tmp_path)
        # Overwrite with violation-free tables.
        _write(
            spark.createDataFrame(
                [(1, 10, "O", 100.0, _t(0), "1-URGENT")],
                "o_orderkey long, o_custkey long, o_orderstatus string, "
                "o_totalprice double, o_orderdate timestamp, "
                "o_orderpriority string",
            ),
            tmp_path,
            "orders",
        )
        _write(
            spark.createDataFrame(
                [(1, 1, 1, 1, 1.0, 10.0, 0.05, 0.01, "N", "O", _t(0))],
                "l_orderkey long, l_partkey long, l_suppkey long, "
                "l_linenumber int, l_quantity double, l_extendedprice double, "
                "l_discount double, l_tax double, l_returnflag string, "
                "l_linestatus string, l_shipdate timestamp",
            ),
            tmp_path,
            "lineitem",
        )
        _write(
            spark.createDataFrame(
                [(10, "a", 1, 50.0, "BUILDING")],
                "c_custkey long, c_name string, c_nationkey int, "
                "c_acctbal double, c_mktsegment string",
            ),
            tmp_path,
            "customer",
        )
        _write(
            spark.createDataFrame(
                [(1, _t(0), 7, "view", 1.0, "{}")],
                "event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string",
            ),
            tmp_path,
            "events",
        )
        rows = dq_constraint_checks(spark, sf_dir).collect()
        assert len(rows) == 7
        assert all(r["passed"] for r in rows)
        assert all(r["metric"] == 1.0 for r in rows)


class TestEwma:
    def _run(self, spark, tmp_path, values):
        rows = [
            (i + 1, _t(i), 1, "view", v, "{}") for i, v in enumerate(values)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, tmp_path, "events")
        out = timeseries_ewma_smooth(spark, str(tmp_path))
        return [
            r["ewma"] for r in out.orderBy("ts", "event_id").collect()
        ]

    def test_partial_window_renormalizes(self, spark, tmp_path):
        # First row: ewma == value (only weight 128 present). Second:
        # (128*x1 + 64*x0) / 192.
        got = self._run(spark, tmp_path, [10.0, 4.0])
        assert got[0] == 10.0
        assert got[1] == round((128 * 4.0 + 64 * 10.0) / 192, 6)

    def test_full_window_weights(self, spark, tmp_path):
        vals = [float(i) for i in range(1, 11)]  # 1..10
        got = self._run(spark, tmp_path, vals)
        # Row 10 uses the last 8 values 3..10 with weights 1..128
        # (oldest->newest).
        weights = [2**k for k in range(8)]  # oldest (3.0) gets 1, newest (10.0) gets 128
        num = sum(w * v for w, v in zip(weights, vals[2:]))
        assert got[-1] == round(num / sum(weights), 6)

    def test_constant_series_is_fixed_point(self, spark, tmp_path):
        got = self._run(spark, tmp_path, [5.5] * 12)
        assert all(g == 5.5 for g in got)

    def test_partitions_do_not_mix_types(self, spark, tmp_path):
        rows = [
            (1, _t(0), 1, "view", 100.0, "{}"),
            (2, _t(1), 1, "click", 0.0, "{}"),
            (3, _t(2), 1, "view", 0.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, tmp_path, "events")
        out = {
            r["event_id"]: r["ewma"]
            for r in timeseries_ewma_smooth(spark, str(tmp_path)).collect()
        }
        # The click partition must not see the view 100.0.
        assert out[2] == 0.0
        assert out[3] == round((128 * 0.0 + 64 * 100.0) / 192, 6)


class TestIncrementalRollup:
    def test_merge_equals_full_recompute(self, spark):
        from pyspark.sql import functions as F

        from rust_ruuvitag_etl_spark.plans.analytics2 import (
            incremental_rollup_merge,
        )
        from rust_ruuvitag_etl_spark.sources import load

        sf = "/root/testdata/sf0.001"
        got = incremental_rollup_merge(spark, sf)
        ev = load(spark, sf, "events")
        full = (
            ev.select(
                "event_type",
                F.date_trunc("hour", "ts").alias("hour"),
                "value",
                F.col("value").cast("decimal(18,6)").alias("v"),
            )
            .groupBy("event_type", "hour")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("v").cast("double").alias("sum_value"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
            .select(
                "event_type", "hour", "n", "sum_value", "min_value",
                "max_value",
                F.round(
                    F.col("sum_value") / F.col("n").cast("double"), 6
                ).alias("avg_value"),
            )
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, full.collect())
        )


class TestBitmapActivity:
    def test_bitmap_bits_and_popcount(self, spark, tmp_path):
        from rust_ruuvitag_etl_spark.plans.analytics2 import (
            bitmap_user_activity,
        )

        rows = [
            # user 1, March: days 1, 3, 31 → bits 0, 2, 30
            (1, dt.datetime(2024, 3, 1, 10), 1, "view", 1.0, "{}"),
            (2, dt.datetime(2024, 3, 3, 10), 1, "view", 1.0, "{}"),
            (3, dt.datetime(2024, 3, 3, 12), 1, "click", 1.0, "{}"),  # same day twice
            (4, dt.datetime(2024, 3, 31, 10), 1, "view", 1.0, "{}"),
            # user 1, April: day 2 only — separate month row
            (5, dt.datetime(2024, 4, 2, 10), 1, "view", 1.0, "{}"),
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, tmp_path, "events")
        got = {
            (r["user_id"], r["month"].month): r
            for r in bitmap_user_activity(spark, str(tmp_path)).collect()
        }
        march = got[(1, 3)]
        assert march["day_bitmap"] == (1 << 0) | (1 << 2) | (1 << 30)
        assert march["active_days"] == 3  # same-day repeats collapse
        assert march["power_user_month"] is False
        april = got[(1, 4)]
        assert april["day_bitmap"] == 1 << 1
        assert april["active_days"] == 1

    def test_power_user_threshold(self, spark, tmp_path):
        from rust_ruuvitag_etl_spark.plans.analytics2 import (
            bitmap_user_activity,
        )

        rows = [
            (d, dt.datetime(2024, 5, d, 9), 7, "view", 1.0, "{}")
            for d in range(1, 21)  # 20 distinct active days
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, tmp_path, "events")
        r = bitmap_user_activity(spark, str(tmp_path)).collect()[0]
        assert r["active_days"] == 20
        assert r["power_user_month"] is True


class TestMadOutliers:
    def _run(self, spark, tmp_path, values, etype="view"):
        rows = [
            (i + 1, _t(i % 60, i // 60), 1, etype, v, "{}")
            for i, v in enumerate(values)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        )
        _write(df, tmp_path, "events")
        from rust_ruuvitag_etl_spark.plans.analytics2 import (
            timeseries_mad_outliers,
        )

        return timeseries_mad_outliers(spark, str(tmp_path)).collect()

    def test_single_spike_is_flagged(self, spark, tmp_path):
        vals = [10.0, 11.0, 10.5, 9.5, 10.2, 9.8, 10.1, 1000.0]
        got = self._run(spark, tmp_path, vals)
        assert len(got) == 1
        assert got[0]["value"] == 1000.0
        assert got[0]["modified_z"] > 3.5

    def test_robust_against_the_outlier_itself(self, spark, tmp_path):
        # Classic stddev failure: with z-score, a huge spike inflates
        # sigma enough that |z| of the spike can stay under a naive
        # threshold. The MAD flags it regardless of its magnitude.
        for spike in (100.0, 1e6, 1e12):
            got = self._run(spark, str(tmp_path) + str(spike),
                            [10.0, 10.1, 9.9, 10.05, 9.95, spike])
            assert [r["value"] for r in got] == [spike]

    def test_mad_zero_group_excluded(self, spark, tmp_path):
        # >=half identical values => MAD = 0: the whole group must be
        # excluded (no division by zero, no infinite z).
        got = self._run(spark, tmp_path, [5.0] * 10 + [99.0])
        assert got == []


class TestAttributionLinear:
    def test_credit_conserves_purchase_value(self, spark):
        """Attribution must CONSERVE value: each purchase's credits sum
        to its value (within the 1e-6 rounding grain x n_touches), and
        exactly one first_touch / one last_touch per purchase."""
        from pyspark.sql import functions as F

        from rust_ruuvitag_etl_spark.plans.analytics2 import (
            attribution_linear_touch,
        )
        from rust_ruuvitag_etl_spark.sources import load

        sf = "/root/testdata/sf0.001"
        rows = attribution_linear_touch(spark, sf).collect()
        assert len(rows) > 0
        by_p = {}
        for r in rows:
            by_p.setdefault(r["purchase_id"], []).append(r)
        vals = {
            r["event_id"]: r["value"]
            for r in load(spark, sf, "events")
            .filter(F.col("event_type") == "purchase")
            .collect()
        }
        for pid, rs in by_p.items():
            n = rs[0]["n_touches"]
            assert len(rs) == n
            assert sum(1 for r in rs if r["first_touch"]) == 1
            assert sum(1 for r in rs if r["last_touch"]) == 1
            assert sorted(r["touch_rank"] for r in rs) == list(
                range(1, n + 1)
            )
            total = sum(r["credit"] for r in rs)
            assert abs(total - vals[pid]) <= 1e-6 * n


class TestJourneyAndPattern:
    def test_transition_probabilities_sum_to_one(self, spark):
        """Each from_type's outgoing probabilities must sum to ~1 and
        its counts to the row total used for the division."""
        from rust_ruuvitag_etl_spark.plans.analytics2 import (
            journey_transition_matrix,
        )

        rows = journey_transition_matrix(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert len(rows) > 0
        by_from = {}
        for r in rows:
            by_from.setdefault(r["from_type"], []).append(r)
        for ft, rs in by_from.items():
            assert abs(sum(r["p"] for r in rs) - 1.0) < 1e-4, ft

    def test_pattern_rejects_dirty_spans(self, spark, tmp_path):
        """Constructed journeys: a clean view->click->purchase matches;
        a span containing an error does not; a purchase with no view
        (click only) does not; the purchase AFTER a purchase starts a
        fresh span."""
        import datetime as dt

        from rust_ruuvitag_etl_spark.plans.analytics2 import (
            pattern_clean_browse_purchase,
        )

        t0 = dt.datetime(2024, 1, 1)

        def r(i, typ, uid):
            return (i, t0 + dt.timedelta(minutes=i), uid, typ, 1.0, "{}")

        rows = [
            # user 1: view click purchase  -> MATCH (purchase id 3)
            r(1, "view", 1), r(2, "click", 1), r(3, "purchase", 1),
            # user 1 second span: error view purchase -> NO match
            r(4, "error", 1), r(5, "view", 1), r(6, "purchase", 1),
            # user 2: click purchase (no view) -> NO match
            r(11, "click", 2), r(12, "purchase", 2),
            # user 3: view purchase, then view purchase -> TWO matches
            r(21, "view", 3), r(22, "purchase", 3),
            r(23, "view", 3), r(24, "purchase", 3),
        ]
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long,"
            " event_type string, value double, props string"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/events.parquet"
        )
        got = {
            r["purchase_id"]: (r["user_id"], r["n_views"], r["n_clicks"])
            for r in pattern_clean_browse_purchase(
                spark, str(tmp_path)
            ).collect()
        }
        assert got == {3: (1, 1, 1), 22: (3, 1, 0), 24: (3, 1, 0)}

    def test_exact_k_sample_counts(self, spark):
        """Exactly min(k, |lang|) rows per language, ranks 1..n, and
        the pick is reproducible."""
        from rust_ruuvitag_etl_spark.plans.llm9 import (
            _EVAL_K,
            sample_exact_k_per_lang,
        )
        from rust_ruuvitag_etl_spark.sources import load

        sf = "/root/testdata/sf0.001"
        rows = sample_exact_k_per_lang(spark, sf).collect()
        sizes = {
            r["lang"]: r["n"]
            for r in load(spark, sf, "documents")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        by_lang = {}
        for r in rows:
            by_lang.setdefault(r["lang"], []).append(r["pick_rank"])
        assert set(by_lang) == set(sizes)
        for lang, ranks in by_lang.items():
            want = min(_EVAL_K, sizes[lang])
            assert sorted(ranks) == list(range(1, want + 1)), lang
        again = {
            (r["doc_id"], r["pick_rank"])
            for r in sample_exact_k_per_lang(spark, sf).collect()
        }
        assert again == {(r["doc_id"], r["pick_rank"]) for r in rows}


class TestChurnSurvival:
    def test_survival_is_monotone_complement(self, spark):
        """S(t) must be non-increasing in recency when read ascending,
        start at the user total for the largest recency bucket's
        cumulative ... i.e. surviving(min recency) == total users, and
        each bucket's surviving = users with recency >= t."""
        from rust_ruuvitag_etl_spark.plans.analytics2 import (
            user_churn_survival,
        )
        from rust_ruuvitag_etl_spark.sources import load

        sf = "/root/testdata/sf0.001"
        rows = sorted(
            user_churn_survival(spark, sf).collect(),
            key=lambda r: r["recency_days"],
        )
        n_users = (
            load(spark, sf, "events").select("user_id").distinct().count()
        )
        assert rows[0]["surviving"] == n_users
        assert abs(rows[0]["survival_rate"] - 1.0) < 1e-9
        # descending-cumulative identity and monotonicity
        tail = 0
        for r in reversed(rows):
            tail += r["n_users"]
            assert r["surviving"] == tail
        for a, b in zip(rows, rows[1:]):
            assert a["surviving"] >= b["surviving"]
