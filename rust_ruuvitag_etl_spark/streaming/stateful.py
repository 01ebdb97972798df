"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's window state is a per-sensor ``Vec<RuuviData>`` that the
main loop folds into an aggregate at interval close
(``/root/reference/src/main.rs:72,97-102`` → ``utils.rs:37-95``). The
built-in windowed aggregation (pipeline.windowed_averages_stream) covers
that; this module is the escape hatch for state machines the built-ins
can't express — here, a *cumulative per-sensor monitor* that carries
running count / running mean / last movement counter ACROSS micro-batches
and emits one updated row per sensor per batch (the reference resets
state every 30 min; a monitor must not).

Scale posture: state lives in the state store keyed by sensor — shuffled
once per micro-batch on the group key, Arrow-batched into pandas. State
size is O(distinct sensors) × a few scalars; a watermark-driven timeout
(``GroupStateTimeout``) would bound it under key churn.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MONITOR_SCHEMA = StructType(
    [
        StructField("sensor_mac", StringType()),
        StructField("total_readings", LongType()),
        StructField("running_mean_temp", DoubleType()),
        StructField("last_movement_counter", IntegerType()),
        StructField("movement_total", LongType()),
    ]
)

# state tuple: (count, sum_cents, last_mc, movement_total).
# Temperatures accumulate as integer CENTS, not a float sum: exact,
# associative, immune to accumulation-order drift across micro-batches —
# and therefore exactly reproducible by a batch SQL oracle (readings are
# 2-dp decimals; a double sum would make the running mean depend on
# batch boundaries).
STATE_SCHEMA = "count LONG, sum_cents LONG, last_mc INTEGER, movement_total LONG"


def _monitor(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's readings into the carried state and emit
    the updated per-sensor row. The wrapping movement-counter delta
    (``utils.rs:64-71``) accumulates across batches: each consecutive
    pair contributes ``(cur - prev) mod 256``."""
    if state.exists:
        count, sum_cents, last_mc, movement_total = state.get
    else:
        count, sum_cents, last_mc, movement_total = 0, 0, None, 0
    for pdf in pdfs:
        # Stable sort with an id tie-break when available: rows with
        # equal timestamps must fold in a deterministic order or the
        # movement accumulation (and any differential oracle) drifts.
        order = [c for c in ("ts", "event_id") if c in pdf.columns]
        pdf = pdf.sort_values(order, kind="mergesort")
        count += len(pdf)
        # Round each ROW to cents before summing: summing floats first
        # and rounding the batch total once would let float error (or a
        # shifted batch boundary) move the total by a cent on large
        # batches — per-row rounding keeps the accumulation exact
        # integer math regardless of batch size or boundaries.
        sum_cents += int(
            pdf["temperature"].mul(100).round().astype("int64").sum()
        )
        for mc in pdf["movement_counter"]:
            mc = int(mc)
            if last_mc is not None:
                movement_total += (mc - last_mc) % 256
            last_mc = mc
    state.update((count, sum_cents, last_mc, movement_total))
    # One IEEE division of exact integers → bit-identical in any engine.
    mean = sum_cents / (100.0 * count) if count else None
    yield pd.DataFrame(
        {
            "sensor_mac": [key[0]],
            "total_readings": [count],
            "running_mean_temp": [mean],
            "last_movement_counter": [last_mc],
            "movement_total": [movement_total],
        }
    )


def sensor_monitor_stream(readings: DataFrame) -> DataFrame:
    """Cumulative per-sensor monitor over a readings stream. Output mode
    must be ``update`` (one refreshed row per sensor per micro-batch)."""
    return readings.groupBy("sensor_mac").applyInPandasWithState(
        _monitor,
        outputStructType=MONITOR_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
