"""Reference-parity batch pipeline: the complete dataflow of
JuusoPaju/rust-ruuvitag-etl re-expressed as composable DataFrame
transformations (SURVEY.md §2 operators B2-B9, W1-W2, A1-A4, J1, P1).

Each stage is a function ``DataFrame -> DataFrame`` so the same pieces
serve the batch pipeline, the Structured Streaming variant
(streaming/pipeline.py), and the registry queries phrased over the
driver's ``events`` table.

Scale design:
- one shuffle total (the window groupBy); the enrichment join is
  broadcast (J1 is a dictionary lookup in the reference,
  ``/root/reference/src/utils.rs:83-87``);
- decode/validate/clamp/round are codegen'd column expressions;
- dedup B8 uses max_by-style aggregation, not a row_number window, so it
  folds into the same shuffle as the aggregate when keys align.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import ruuvi as rf

METRIC_COLS = (
    "temperature",
    "humidity",
    "pressure",
    "acceleration_x",
    "acceleration_y",
    "acceleration_z",
)


def decode_adverts(raw: DataFrame, payload_col: str = "payload") -> DataFrame:
    """B2+B3+B4+B5 (+B7 if a manufacturer map is present): validate and
    decode format-5 payloads; malformed rows are dropped like the
    reference's ``None`` return (``scanner.rs:36-45``)."""
    payload = F.col(payload_col)
    if "manufacturer_id" in raw.columns:
        raw = raw.filter(F.col("manufacturer_id") == rf.RUUVITAG_MANUFACTURER_ID)
    decoded = raw.filter(rf.is_valid_format5(payload))
    fields = rf.decode_format5(payload)
    return decoded.select(
        *[c for c in raw.columns if c not in (payload_col, "manufacturer_id")],
        *[expr.alias(name) for name, expr in fields.items()],
    )


def normalize_mac(df: DataFrame, col: str = "sensor_mac") -> DataFrame:
    """MAC uppercasing (``scanner.rs:175``)."""
    return df.withColumn(col, F.upper(F.col(col)))


def registry_semi_join(readings: DataFrame, tags: DataFrame) -> DataFrame:
    """B6: keep only configured sensors — broadcast left-semi join
    (``scanner.rs:175-178``)."""
    return readings.join(
        F.broadcast(tags.select("sensor_mac")), "sensor_mac", "left_semi"
    )


def dedup_last_wins(
    readings: DataFrame,
    keys: tuple[str, ...] = ("sensor_mac", "scan_id"),
    order_col: str = "ts",
) -> DataFrame:
    """B8: ≤1 reading per key per scan, later arrival wins
    (``scanner.rs:99,185`` HashMap insert overwrite).

    Implemented as one hash aggregate with ``max_by(struct(*), order)``
    rather than a sort-window: a single partial+final agg, no per-group
    sort, and AQE can handle skewed sensors.
    """
    other = [c for c in readings.columns if c not in keys]
    packed = readings.groupBy(*keys).agg(
        F.max_by(F.struct(*other), F.col(order_col)).alias("_r")
    )
    return packed.select(*keys, *[F.col(f"_r.{c}").alias(c) for c in other])


def window_aggregate(
    readings: DataFrame,
    key: str = "sensor_mac",
    ts_col: str = "ts",
    window: str = "30 minutes",
) -> DataFrame:
    """B9+W1+W2+A1-A4: tumbling event-time window per sensor with the
    reference's aggregate set (``/root/reference/src/utils.rs:37-95``):

    - mean of the six metrics, rounded 2/2/2/3/3/3 dp (A1 + B5 second
      rounding, ``utils.rs:75-80``)
    - sample count (A2, ``utils.rs:88``)
    - movement delta = wrapping first/last difference ordered by time
      (A3, ``utils.rs:64-71``) — ``min_by/max_by`` on the timestamp makes
      the reference's arrival-order semantics deterministic (§4.2.2)
    - empty groups never appear (A4) — groupBy emits no row for absent keys
    - window-end timestamp as the output time (W2 normalized to event
      time per §4.2.3; reference stamps wall clock, ``utils.rs:82``)
    """
    w = F.window(F.col(ts_col), window)
    rounds = {c: 2 for c in METRIC_COLS[:3]} | {c: 3 for c in METRIC_COLS[3:]}
    aggs = [
        F.round(F.avg(c), nd).alias(c) for c, nd in rounds.items()
    ] + [
        rf.wrapped_delta(
            F.max_by("movement_counter", F.col(ts_col)),
            F.min_by("movement_counter", F.col(ts_col)),
        ).alias("movement_delta"),
        F.count(F.lit(1)).cast("int").alias("samples"),
    ]
    agg = readings.groupBy(F.col(key), w.alias("w")).agg(*aggs)
    return agg.select(
        F.col(key),
        F.col("w.end").alias("time"),
        *[c for c in rounds],
        "movement_delta",
        "samples",
    )


def enrich_names(agg: DataFrame, tags: DataFrame, key: str = "sensor_mac") -> DataFrame:
    """J1: broadcast left join to the registry, ``'Unknown'`` on miss
    (``utils.rs:83-87``)."""
    return agg.join(F.broadcast(tags), key, "left").withColumn(
        "name", F.coalesce(F.col("name"), F.lit("Unknown"))
    )


def split_outputs(enriched: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P1: vertical split into the two sink relations
    (``/root/reference/src/database/operations.rs:32-43,75-87``)."""
    sensor_data = enriched.select(
        "sensor_mac", "temperature", "humidity", "pressure", "time", "name", "samples"
    )
    movement_data = enriched.select(
        "sensor_mac",
        "acceleration_x",
        "acceleration_y",
        "acceleration_z",
        F.col("movement_delta").alias("movement_counter"),
        "time",
        "name",
        "samples",
    )
    return sensor_data, movement_data


def ruuvi_batch_pipeline(
    raw_adverts: DataFrame, tags: DataFrame, window: str = "30 minutes"
) -> tuple[DataFrame, DataFrame]:
    """The whole reference dataflow end-to-end (``src/main.rs:66-185``):
    scan → decode → registry filter → per-scan dedup → window aggregate →
    name enrichment → two sink projections."""
    readings = decode_adverts(normalize_mac(raw_adverts))
    readings = registry_semi_join(readings, tags)
    if "scan_id" in readings.columns:
        readings = dedup_last_wins(readings)
    agg = window_aggregate(readings, window=window)
    return split_outputs(enrich_names(agg, tags))


def observed(df: DataFrame, name: str = "pipeline_metrics"):
    """Attach the reference's run-summary observability
    (``/root/reference/src/main.rs:157-172`` logs sensors-reported /
    total-readings and warns when NO sensor reported) as zero-cost
    observed metrics: computed during the write/collect action itself,
    no second pass over the data.

    Returns (df, observation); read ``observation.get`` after an action
    to obtain {'rows': n, 'sensors': k} and raise the empty-run warning
    the reference logs.

    Parity caveat: ``rows`` (and therefore the empty-run signal) is
    exact; ``sensors`` is APPROXIMATE (HyperLogLog++) because Spark
    rejects DISTINCT aggregates inside observed metrics
    (INVALID_OBSERVED_METRICS) — on large runs the count can deviate ~2%
    from the reference's exact count. Exact parity needs a separate
    ``countDistinct`` aggregation pass (one extra job over the output).
    """
    from pyspark.sql import Observation

    key = "sensor_mac" if "sensor_mac" in df.columns else df.columns[0]
    obs = Observation(name)
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.approx_count_distinct(key).alias("sensors"),
        ),
        obs,
    )
