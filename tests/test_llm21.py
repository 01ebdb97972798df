"""Round-10 wave 7: retention TTL, as-of tolerance, streaming CUSUM."""

import datetime

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.plans.llm21 import (
    governance_retention_ttl,
    join_asof_tolerance,
)
from rust_ruuvitag_etl_spark.sources import load
from tests.test_llm14 import _EV_SCHEMA, _write

SF_SMALL = "/root/testdata/sf0.001"


class TestRetentionTTL:
    def test_counts_partition(self, spark):
        rows = governance_retention_ttl(spark, SF_SMALL).collect()
        assert rows
        for r in rows:
            assert r["n_total"] == r["n_expired"] + r["n_retained"]
            assert 0.0 <= r["expired_frac"] <= 1.0
            assert r["ttl_days"] == 90
            if r["n_expired"] > 0:
                assert r["oldest_age_days"] > 90


class TestAsofTolerance:
    def test_every_purchase_retained(self, spark):
        df = join_asof_tolerance(spark, SF_SMALL)
        rows = df.collect()
        n_purchases = (
            load(spark, SF_SMALL, "events")
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        assert len(rows) == n_purchases  # left semantics: nothing drops
        for r in rows:
            assert r["matched"] == (r["view_id"] is not None)
            if r["matched"]:
                assert 0 <= r["gap_seconds"] <= 24 * 3600
            else:
                assert r["gap_seconds"] is None

    def test_tolerance_excludes_stale_view(self, spark, tmp_path):
        base = datetime.datetime(2024, 5, 10, 12, 0, 0)
        rows = [
            # view 25h before purchase: OUTSIDE tolerance
            (1, base - datetime.timedelta(hours=25), 7, "view", 1.0, "{}"),
            # view 2h before purchase: the match
            (2, base - datetime.timedelta(hours=2), 7, "view", 1.0, "{}"),
            (3, base, 7, "purchase", 9.0, "{}"),
            # purchase with only a stale view: unmatched
            (4, base - datetime.timedelta(hours=30), 8, "view", 1.0, "{}"),
            (5, base, 8, "purchase", 9.0, "{}"),
        ]
        d = _write(spark, tmp_path, "events", _EV_SCHEMA, rows)
        got = {r["purchase_id"]: r for r in
               join_asof_tolerance(spark, d).collect()}
        assert got[3]["view_id"] == 2
        assert got[3]["gap_seconds"] == 2 * 3600
        assert got[5]["matched"] is False and got[5]["view_id"] is None


class TestStreamingCusum:
    def test_cents_rounding_ties_away_from_zero(self):
        # 0.125*100 = 12.5 is an EXACT binary tie: DuckDB ROUND and
        # Spark F.round both give 13; Python round() gives 12.
        from rust_ruuvitag_etl_spark.streaming.stateful import (
            _round_half_away_cents,
        )

        assert _round_half_away_cents(0.125) == 13
        assert _round_half_away_cents(-0.125) == -13
        assert _round_half_away_cents(0.12) == 12
        assert _round_half_away_cents(0.1249) == 12

    def test_matches_batch_closed_form(self, spark):
        from rust_ruuvitag_etl_spark.plans.streaming_batchck import (
            streaming_cusum_alarm,
        )
        from rust_ruuvitag_etl_spark.streaming.stateful import (
            CUSUM_H_CENTS,
            CUSUM_TARGET_CENTS,
            _round_half_away_cents,
        )

        rows = streaming_cusum_alarm(spark, SF_SMALL).collect()
        assert rows
        # independently refold the recurrence in Python per type
        ev = (
            load(spark, SF_SMALL, "events")
            .filter(F.col("value").isNotNull())
            .select("event_type", "ts", "event_id", "value")
            .collect()
        )
        series = {}
        for e in sorted(ev, key=lambda e: (e["ts"], e["event_id"])):
            series.setdefault(e["event_type"], []).append(e["value"])
        for r in rows:
            s = mx = alarms = 0
            first = None
            for i, v in enumerate(series[r["event_type"]], start=1):
                # half-AWAY-from-zero like both engines; Python round()
                # is banker's and would mask a tie divergence
                s = max(
                    0, s + _round_half_away_cents(v) - CUSUM_TARGET_CENTS
                )
                mx = max(mx, s)
                if s > CUSUM_H_CENTS:
                    alarms += 1
                    if first is None:
                        first = i
            assert r["n_events"] == len(series[r["event_type"]])
            assert r["cusum"] == s
            assert r["max_cusum"] == mx
            assert r["n_alarms"] == alarms
            assert r["first_alarm_rn"] == first
