"""Semantics tests for the product-analytics family (plans/analytics.py):
funnel stage ordering, OHLC open/close tie-breaks, retention offsets,
and z-score moment exactness — on a hand-built events table where every
expected value is known by construction. The registry-level differential
(test_registry) separately hash-checks these queries against DuckDB on
the driver testdata.
"""

from __future__ import annotations

import datetime as dt

import pytest

from rust_ruuvitag_etl_spark.plans.analytics import (
    funnel_view_click_purchase,
    retention_weekly_cohorts,
    timeseries_ohlc_downsample,
    timeseries_zscore_outliers,
)

UTC = dt.timezone.utc


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts, user_id, event_type, value). Written in the
    driver testdata's current physical layout (µs timestamps)."""
    df = spark.createDataFrame(
        [(i, t, u, e, v, "{}") for (i, t, u, e, v) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def _t(minute, second=0):
    return dt.datetime(2024, 3, 4, 10, minute, second)


class TestFunnel:
    def test_stage_ordering_is_enforced(self, spark, tmp_path):
        rows = [
            # user 1: full ordered funnel view->click->purchase
            (1, _t(0), 1, "view", 1.0),
            (2, _t(1), 1, "click", 1.0),
            (3, _t(2), 1, "purchase", 1.0),
            # user 2: click BEFORE any view — click must not count;
            # purchase after the (never-qualified) click must not count
            (4, _t(0), 2, "click", 1.0),
            (5, _t(1), 2, "view", 1.0),
            (6, _t(2), 2, "purchase", 1.0),
            # user 3: view then purchase, no click — stops at stage 1
            (7, _t(0), 3, "view", 1.0),
            (8, _t(1), 3, "purchase", 1.0),
            # user 4: purchase before click before view — only view counts
            (9, _t(0), 4, "purchase", 1.0),
            (10, _t(1), 4, "click", 1.0),
            (11, _t(2), 4, "view", 1.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {
            r["stage"]: r["users"]
            for r in funnel_view_click_purchase(spark, sf).collect()
        }
        assert got == {"1_view": 4, "2_click": 1, "3_purchase": 1}

    def test_simultaneous_click_does_not_count(self, spark, tmp_path):
        # strict ts > first_view: a click at the exact view timestamp
        # is not "after" the view
        rows = [
            (1, _t(0), 1, "view", 1.0),
            (2, _t(0), 1, "click", 1.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {
            r["stage"]: r["users"]
            for r in funnel_view_click_purchase(spark, sf).collect()
        }
        assert got == {"1_view": 1, "2_click": 0, "3_purchase": 0}


class TestOHLC:
    def test_open_close_by_time_with_id_tiebreak(self, spark, tmp_path):
        rows = [
            # same hour bucket; equal-ts rows break ties by event_id
            (10, _t(5), 1, "click", 7.0),
            (11, _t(5), 1, "click", 8.0),  # same ts, larger id
            (12, _t(50), 1, "click", 2.0),
            (13, _t(20), 1, "click", 99.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        row = timeseries_ohlc_downsample(spark, sf).collect()
        assert len(row) == 1
        r = row[0]
        assert r["open"] == 7.0  # smallest (ts, event_id)
        assert r["close"] == 2.0  # largest (ts, event_id)
        assert r["high"] == 99.0 and r["low"] == 2.0
        assert r["n_events"] == 4
        assert r["volume"] == pytest.approx(116.0)


class TestRetention:
    def test_week_offsets(self, spark, tmp_path):
        mon1 = dt.datetime(2024, 3, 4, 12)  # Monday week 0
        mon2 = dt.datetime(2024, 3, 11, 9)  # next week
        mon3 = dt.datetime(2024, 3, 18, 23)
        rows = [
            (1, mon1, 1, "view", 1.0),
            (2, mon2, 1, "view", 1.0),  # user 1 active week 1
            (3, mon3, 1, "view", 1.0),  # and week 2
            (4, mon2, 2, "view", 1.0),  # user 2's cohort IS week of mon2
            (5, mon3, 2, "view", 1.0),  # active 1 week after their cohort
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {
            (r["cohort_week"], r["week_offset"]): r["active_users"]
            for r in retention_weekly_cohorts(spark, sf).collect()
        }
        w0 = dt.datetime(2024, 3, 4)
        w1 = dt.datetime(2024, 3, 11)
        assert got == {
            (w0, 0): 1,
            (w0, 1): 1,
            (w0, 2): 1,
            (w1, 0): 1,
            (w1, 1): 1,
        }


class TestZscore:
    def test_outlier_detection_exact_moments(self, spark, tmp_path):
        # 9 values at 10.0 and one at 100.0: mean=19, std=28.4605...,
        # z(100) = (100-19)/28.4605 ≈ 2.846 > 2.5 → exactly one outlier;
        # z(10) = -0.316 → kept out
        rows = [(i, _t(i), 1, "view", 10.0) for i in range(9)]
        rows.append((9, _t(9), 1, "view", 100.0))
        sf = _write_events(spark, tmp_path, rows)
        out = timeseries_zscore_outliers(spark, sf).collect()
        assert len(out) == 1
        assert out[0]["event_id"] == 9
        assert out[0]["zscore"] == pytest.approx(2.846, abs=1e-3)


class TestFunnelDeadline:
    def test_late_click_does_not_convert(self, spark, tmp_path):
        from rust_ruuvitag_etl_spark.plans.analytics import funnel_deadline_1h

        rows = [
            # user 1: click 30 min after view → converts
            (1, _t(0), 1, "view", 1.0),
            (2, _t(30), 1, "click", 1.0),
            # user 2: click 61 min after view → outside the 1 h deadline
            (3, _t(0), 2, "view", 1.0),
            (4, dt.datetime(2024, 3, 4, 11, 1), 2, "click", 1.0),
            # user 1 purchase 59 min after the click → converts
            (5, dt.datetime(2024, 3, 4, 11, 29), 1, "purchase", 1.0),
        ]
        sf = _write_events(spark, tmp_path, rows)
        got = {r["stage"]: r["users"] for r in funnel_deadline_1h(spark, sf).collect()}
        assert got == {"1_view": 2, "2_click_1h": 1, "3_purchase_1h": 1}
