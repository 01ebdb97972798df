"""Round-10 wave 4: CUSUM, Fleiss' kappa, time-decay attribution."""

import datetime

from rust_ruuvitag_etl_spark.plans.llm19 import (
    attribution_time_decay,
    eval_fleiss_kappa,
    timeseries_cusum_alarm,
)
from tests.test_llm14 import _EV_SCHEMA, _write

SF_SMALL = "/root/testdata/sf0.001"


class TestCusum:
    def test_summary_invariants(self, spark):
        rows = timeseries_cusum_alarm(spark, SF_SMALL).collect()
        assert rows  # one per event type with values
        for r in rows:
            assert r["max_cusum_scaled"] >= 0
            assert 0 <= r["n_alarms"] <= r["n_events"]
            assert r["alarmed"] == (r["n_alarms"] > 0)
            if r["alarmed"]:
                assert 1 <= r["first_alarm_rn"] <= r["n_events"]
            else:
                assert r["first_alarm_rn"] is None

    def test_constant_series_never_alarms(self, spark, tmp_path):
        base = datetime.datetime(2024, 3, 1)
        rows = [
            (i, base + datetime.timedelta(minutes=i), 1, "view", 5.0, "{}")
            for i in range(50)
        ]
        d = _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
        got = timeseries_cusum_alarm(spark, d).collect()
        assert len(got) == 1
        r = got[0]
        # constant series: every prefix equals the mean, cusum stays 0
        assert r["max_cusum_scaled"] == 0
        assert r["n_alarms"] == 0 and r["alarmed"] is False


class TestFleiss:
    def test_kappa_bounds_and_marginals(self, spark):
        r = eval_fleiss_kappa(spark, SF_SMALL).collect()[0]
        assert r["c0"] + r["c1"] + r["c2"] == 3 * r["n_items"]
        # s_sq per item ranges from 3 (total disagreement) to 9
        assert 3 * r["n_items"] <= r["s_sq"] <= 9 * r["n_items"]
        assert 0.0 <= r["p_bar"] <= 1.0
        assert 0.0 < r["p_e"] <= 1.0
        assert -1.0 <= r["kappa"] <= 1.0


class TestTimeDecayAttribution:
    def test_credits_sum_to_value(self, spark):
        from pyspark.sql import functions as F

        from rust_ruuvitag_etl_spark.sources import load

        df = attribution_time_decay(spark, SF_SMALL)
        rows = df.collect()
        assert rows
        for r in rows:
            assert 1 <= r["touch_rank"] <= r["n_touches"]
            assert r["weight"] in {1, 2, 4, 8, 16, 32, 64, 128}
            assert r["credit"] >= 0.0
        # per purchase, credits sum to ~value (micro-rounding slack)
        by_purchase = {}
        for r in rows:
            by_purchase.setdefault(r["purchase_id"], []).append(r["credit"])
        ev = load(spark, SF_SMALL, "events")
        vals = {
            row["event_id"]: row["value"]
            for row in ev.filter(F.col("event_type") == "purchase").collect()
        }
        for pid, credits in by_purchase.items():
            assert abs(sum(credits) - vals[pid]) < 1e-4 * len(credits) + 1e-6

    def test_newer_touch_gets_more_credit(self, spark):
        rows = attribution_time_decay(spark, SF_SMALL).collect()
        by_purchase = {}
        for r in rows:
            by_purchase.setdefault(r["purchase_id"], []).append(r)
        checked = 0
        for rs in by_purchase.values():
            if len(rs) < 2:
                continue
            rs.sort(key=lambda r: r["touch_rank"])
            # weights are non-decreasing in recency (later rank = newer)
            weights = [r["weight"] for r in rs]
            assert weights == sorted(weights)
            checked += 1
        assert checked > 0
