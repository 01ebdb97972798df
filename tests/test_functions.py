"""Property-based tests (SURVEY.md §5.4): the decoder is total over
random bytes; window aggregates stay within physical bounds."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.functions import ruuvi as rf
from rust_ruuvitag_etl_spark.functions import text as tf

# One shared tiny spark session comes from conftest; hypothesis drives
# plain-Python paths against collected results.


class TestDecoderTotality:
    @settings(max_examples=20, deadline=None)
    @given(st.binary(min_size=0, max_size=40))
    def test_never_raises_and_bounds(self, payload):
        # Driverless re-implementation of the expression semantics for
        # speed; the Spark-side equivalence is pinned in
        # test_ruuvi_pipeline.TestDecode.
        valid = len(payload) == rf.PAYLOAD_LEN and payload[0] == rf.DATA_FORMAT
        if not valid:
            return
        temp_raw = int.from_bytes(payload[1:3], "big", signed=True)
        hum_raw = int.from_bytes(payload[3:5], "big")
        temp = temp_raw * 0.005
        hum = min(hum_raw * 0.0025, 100.0)
        assert -163.84 <= temp <= 163.835
        assert 0.0 <= hum <= 100.0

    def test_spark_decoder_on_random_bytes(self, spark):
        import random

        rnd = random.Random(42)
        rows = [(bytes(rnd.randrange(256) for _ in range(rnd.choice([0, 3, 24, 24, 24, 30]))),) for _ in range(200)]
        df = spark.createDataFrame(rows, "payload binary")
        fields = rf.decode_format5(F.col("payload"))
        out = df.filter(rf.is_valid_format5(F.col("payload"))).select(
            *[e.alias(n) for n, e in fields.items()]
        )
        for r in out.collect():
            assert -163.84 <= r["temperature"] <= 163.835
            assert 0.0 <= r["humidity"] <= 100.0
            assert 500.0 <= r["pressure"] <= 1155.35
            assert 0 <= r["movement_counter"] <= 255


class TestTextFunctions:
    def test_token_counts_edges(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, "   "), (3, "one"), (4, "one two  three"), (5, "a,b!c")],
            "id long, text string",
        )
        out = {
            r["id"]: (r["ws"], r["bp"])
            for r in df.select(
                "id",
                tf.token_count(F.col("text")).alias("ws"),
                tf.bpeish_token_count(F.col("text")).alias("bp"),
            ).collect()
        }
        assert out[1] == (0, 0)
        assert out[2][0] == 0
        assert out[3] == (1, 1)
        assert out[4][0] == 3
        assert out[5][1] == 5  # a , b ! c

    def test_shingles(self, spark):
        df = spark.createDataFrame([(1, "a b c d"), (2, "a b")], "id long, text string")
        out = {
            r["id"]: r["s"]
            for r in df.select(
                "id", tf.shingles(F.col("text"), 3).alias("s")
            ).collect()
        }
        assert out[1] == ["a b c", "b c d"]
        assert out[2] == []

    def test_quality_score_range(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat sat on the mat and it is fine"), (2, "!!! ??? ***"), (3, "x")],
            "id long, text string",
        )
        out = {
            r["id"]: r["q"]
            for r in df.select(
                "id", tf.quality_score(F.col("text")).alias("q")
            ).collect()
        }
        for v in out.values():
            assert 0.0 <= v <= 1.0
        assert out[1] > out[2]  # clean prose beats punctuation soup
