"""Tests for the as-of join operator and multimodal binary plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.operators import multimodal as mm
from rust_ruuvitag_etl_spark.operators.asof import asof_join


class TestAsofJoin:
    def _frames(self, spark):
        trades = spark.createDataFrame(
            [
                ("A", "2024-01-01T10:00:05", 100),
                ("A", "2024-01-01T10:00:30", 101),
                ("B", "2024-01-01T10:00:10", 200),
                ("C", "2024-01-01T10:00:10", 300),  # no quotes at all
            ],
            "sym string, ts_s string, trade_id int",
        ).select("sym", F.col("ts_s").cast("timestamp").alias("ts"), "trade_id")
        quotes = spark.createDataFrame(
            [
                ("A", "2024-01-01T10:00:00", 10.0),
                ("A", "2024-01-01T10:00:05", 10.5),  # equal ts → inclusive
                ("A", "2024-01-01T10:00:20", 11.0),
                ("B", "2024-01-01T10:00:15", 20.0),  # after the trade
            ],
            "sym string, ts_s string, px double",
        ).select("sym", F.col("ts_s").cast("timestamp").alias("ts"), "px")
        return trades, quotes

    def test_backward_inclusive(self, spark):
        trades, quotes = self._frames(spark)
        out = asof_join(trades, quotes, key="sym", right_value_cols=("px",))
        got = {r["trade_id"]: r["px_asof"] for r in out.collect()}
        assert got[100] == 10.5  # equal-ts quote wins (inclusive)
        assert got[101] == 11.0  # latest prior quote
        assert got[200] is None  # only future quotes exist
        assert got[300] is None  # key never quoted
        assert len(got) == 4  # every left row survives


class TestMultimodal:
    def test_decode_stubs_raise(self):
        with pytest.raises(NotImplementedError):
            mm.decode_image(b"xx")
        with pytest.raises(NotImplementedError):
            mm.decode_audio(b"xx")
        assert mm.decode_image(b"xx", fake=True)["channels"] == 3

    def test_extract_features(self, spark):
        docs = spark.createDataFrame(
            [(1, "hello"), (2, ""), (3, "wörld")], "doc_id long, text string"
        )
        feats = {
            r["media_id"]: r
            for r in mm.extract_features(mm.documents_as_media(docs)).collect()
        }
        import hashlib

        assert feats[1]["n_bytes"] == 5
        assert feats[1]["digest"] == hashlib.md5(b"hello").hexdigest()
        assert feats[2]["n_bytes"] == 0 and feats[2]["first_byte"] == -1
        assert feats[3]["n_bytes"] == 6  # ö is 2 bytes in UTF-8

    def test_frame_sampling(self, spark):
        docs = spark.createDataFrame(
            [(1, "x" * 2560)], "doc_id long, text string"
        )
        frames = mm.sample_frames(mm.documents_as_media(docs), every_nth=2).collect()
        assert [r["frame_no"] for r in frames] == [0, 2, 4, 6, 8]
        assert all(len(r["frame"]) == 256 for r in frames)

    def test_resize_keeps_every_kth_byte(self, spark):
        docs = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
        out = mm.resize_media(mm.documents_as_media(docs), factor=2).collect()
        assert len(out) == 1
        assert bytes(out[0]["content"]) == b"aceg"
        assert out[0]["scale_factor"] == 2


class TestSlidingWindow:
    def test_each_event_in_exactly_two_windows(self, spark):
        from rust_ruuvitag_etl_spark.plans import REGISTRY
        from rust_ruuvitag_etl_spark.sources import load
        from .conftest import SF_SMALL

        out = REGISTRY["sliding_window_user_value"].fn(spark, SF_SMALL)
        total = out.agg(F.sum("n")).collect()[0][0]
        n_events = load(spark, SF_SMALL, "events").count()
        assert total == 2 * n_events

    def test_window_starts_quarter_aligned(self, spark):
        from rust_ruuvitag_etl_spark.plans import REGISTRY
        from .conftest import SF_SMALL

        rows = REGISTRY["sliding_window_user_value"].fn(spark, SF_SMALL).head(50)
        for r in rows:
            ws = r["window_start"]
            assert ws.minute % 15 == 0 and ws.second == 0


class TestGapFill:
    def test_grid_contiguous_and_fill_forward(self, spark):
        from rust_ruuvitag_etl_spark.plans.timeseries import timeseries_gap_fill

        from .conftest import SF_SMALL

        out = timeseries_gap_fill(spark, SF_SMALL)
        rows = out.orderBy("user_id", "window_start").collect()
        assert rows
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(r)
        checked_gap = False
        for user, rs in by_user.items():
            # grid is contiguous at 30-minute steps
            for a, b in zip(rs, rs[1:]):
                assert (
                    b["window_start"] - a["window_start"]
                ).total_seconds() == 1800, (user, a, b)
            # first bucket is observed (grid starts at min observed)
            assert rs[0]["avg_value"] is not None
            # forward fill: filled_value equals the last observed value
            last = None
            for r in rs:
                if r["avg_value"] is not None:
                    last = r["avg_value"]
                    assert r["is_gap"] is False
                else:
                    assert r["is_gap"] is True
                    checked_gap = True
                assert r["filled_value"] == last
        assert checked_gap, "corpus produced no gaps; test is vacuous"
