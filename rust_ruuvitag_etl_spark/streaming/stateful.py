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


# --- streaming EWMA -------------------------------------------------------

EWMA_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ewma_num", LongType()),
        StructField("ewma_den", LongType()),
    ]
)

# state: the up-to-7 most recent samples (most recent LAST) in exact
# integer micro-units (value quantized to 6dp like the batch twin's
# DECIMAL(18,6) cast), plus the (ts, event_id) high-water mark of the
# last folded row — the cross-batch ordering sentinel (see _ewma).
EWMA_STATE_SCHEMA = "vals ARRAY<LONG>, hwm_ts LONG, hwm_id LONG"

_EWMA_W = 8


def _quantize_micros(x: float) -> int:
    """Replicate Spark's double→DECIMAL(18,6) cast (shortest-repr then
    HALF_UP at 6dp) so the streaming path folds the SAME integers the
    batch plan does."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        (Decimal(repr(float(x))) * 1000000).quantize(
            Decimal("1"), rounding=ROUND_HALF_UP
        )
    )


def _ewma(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-key EWMA over the last 8 samples (decay 1/2, integer weights
    2^k): every arriving row emits its smoothed value; the carried
    state is just the 7 previous samples in micro-units — O(1) per key,
    exact across any micro-batch boundary.

    ENFORCED ordering sentinel: rows are sorted (ts, event_id) within
    the batch, and the state carries the high-water mark of the last
    folded row. A micro-batch whose earliest row precedes the mark
    would silently fold out of order (diverging from the batch LAG
    oracle), so it raises instead — loud failure over wrong answers;
    see :func:`ewma_stream` for the contract."""
    if state.exists:
        st = state.get
        prev: list[int] = list(st[0])
        hwm = (st[1], st[2]) if st[1] is not None else None
    else:
        prev = []
        hwm = None
    chunks = list(pdfs)
    if not chunks:
        # Reachable only when a timeout is configured (timed-out keys are
        # invoked with no data): carry state forward, emit nothing.
        if prev:
            state.update(
                (prev, hwm[0] if hwm else None, hwm[1] if hwm else None)
            )
        return
    pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
    order = [c for c in ("ts", "event_id") if c in pdf.columns]
    pdf = pdf.sort_values(order, kind="mergesort")

    def _okey(row) -> tuple[int, int]:
        ts = int(pd.Timestamp(row["ts"]).value) if "ts" in order else 0
        eid = int(row["event_id"]) if "event_id" in order else 0
        return ts, eid

    if order:
        batch_min = _okey(pdf.iloc[0])
        if hwm is not None and batch_min < hwm:
            raise ValueError(
                "ewma_stream ordering contract violated: micro-batch "
                f"starts at (ts_ns, event_id)={batch_min} but a prior "
                f"batch already folded through {hwm}; pre-sort the "
                "source per trigger or feed batches in (ts, event_id) "
                "order (see ewma_stream docstring)"
            )
        hwm = _okey(pdf.iloc[-1])
    out_num: list[int] = []
    out_den: list[int] = []
    for v in pdf["value"]:
        prev.append(_quantize_micros(v))
        if len(prev) > _EWMA_W:
            prev.pop(0)
        num = 0
        den = 0
        # most recent sample (last element) takes the largest weight
        for age, micros in enumerate(reversed(prev)):
            w = 2 ** (_EWMA_W - 1 - age)
            num += micros * w
            den += w
        out_num.append(num)
        out_den.append(den)
    state.update(
        (prev, hwm[0] if hwm else None, hwm[1] if hwm else None)
    )
    yield pd.DataFrame(
        {
            "event_id": pdf["event_id"].astype("int64"),
            "event_type": [key[0]] * len(pdf),
            "ewma_num": out_num,
            "ewma_den": out_den,
        }
    )


def ewma_stream(events: DataFrame) -> DataFrame:
    """Streaming EWMA smoother: ``events`` needs (event_id, event_type,
    ts, value). Output mode ``append`` — one smoothed row per event.

    ORDERING CONTRACT (enforced): rows are sorted by (ts, event_id)
    WITHIN each micro-batch, and the per-key state carries the
    high-water mark of the last folded row — a later micro-batch whose
    earliest row precedes it RAISES instead of silently folding out of
    order. The batch LAG oracle (`plans/analytics2.py`
    timeseries_ewma_smooth) therefore matches every stream this
    operator accepts; the registry harness ships `events` as one
    parquet file = one availableNow micro-batch
    (`plans/streaming_batchck.py`), and a production deployment with
    multiple files / `maxFilesPerTrigger` must pre-sort the source per
    trigger (out-of-order feeds fail loudly, never diverge —
    tests/test_streaming.py plants one to pin this)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _ewma,
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
