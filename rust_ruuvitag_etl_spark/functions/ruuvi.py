"""RuuviTag data-format-5 decode and reference-parity scalar functions.

The reference decodes a 24-byte big-endian manufacturer payload record
at a time in Rust (``/root/reference/src/bluetooth/scanner.rs:35-83``).
Here the decode is a tree of built-in column expressions over
``BinaryType`` — JVM-side, inside WholeStageCodegen, no Python in the
hot path — so a 100 TB scan of payloads decodes at parquet-reader speed.
A vectorized pandas-UDF variant (``decode_format5_pandas``) exists to
exercise the Arrow multimodal path and is tested for equality with the
expression version.

Field layout (``scanner.rs:17-28``):
  byte0 format(=5) | bytes1-2 temp i16 BE ×0.005°C | bytes3-4 humidity
  u16 BE ×0.0025% (clamped 100) | bytes5-6 pressure u16 BE +50000 Pa |
  bytes7-12 accel x/y/z i16 BE ×0.001 g | byte15 movement counter u8.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

PAYLOAD_LEN = 24  # scanner.rs:12 DATA_LENGTH
DATA_FORMAT = 5  # scanner.rs:11
RUUVITAG_MANUFACTURER_ID = 0x0499  # scanner.rs:11


def be_uint(payload: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from 1-based byte position (JVM expression)."""
    return F.conv(F.hex(F.substring(payload, pos, nbytes)), 16, 10).cast("long")


def be_u8(payload: Column, pos: int) -> Column:
    return be_uint(payload, pos, 1)


def be_u16(payload: Column, pos: int) -> Column:
    return be_uint(payload, pos, 2)


def be_i16(payload: Column, pos: int) -> Column:
    """Sign-extended big-endian i16 (Rust ``i16::from_be_bytes``, scanner.rs:50)."""
    v = be_u16(payload, pos)
    return F.when(v > 32767, v - 65536).otherwise(v)


def clamp(col: Column, lo: float | None = None, hi: float | None = None) -> Column:
    """B4: ``.min(100.0)``-style clamp (scanner.rs:53) generalized."""
    out = col
    if hi is not None:
        out = F.least(out, F.lit(float(hi)))
    if lo is not None:
        out = F.greatest(out, F.lit(float(lo)))
    return out


def round2(col: Column) -> Column:
    """B5: half-away-from-zero 2 dp (scanner.rs:68-70; Spark HALF_UP matches)."""
    return F.round(col, 2)


def round3(col: Column) -> Column:
    """B5: 3 dp for accelerations (scanner.rs:71-73)."""
    return F.round(col, 3)


def is_valid_format5(payload: Column) -> Column:
    """B3 validation predicate (scanner.rs:36-45): length 24 and byte0 == 5."""
    return (F.length(payload) == PAYLOAD_LEN) & (be_u8(payload, 1) == DATA_FORMAT)


def decode_format5(payload: Column) -> dict[str, Column]:
    """B2: full field decode as named column expressions (scanner.rs:47-83).

    Caller is responsible for filtering on :func:`is_valid_format5` first
    (the reference returns ``None`` → row dropped).
    """
    return {
        "temperature": round2(be_i16(payload, 2) * F.lit(0.005)),
        "humidity": round2(clamp(be_u16(payload, 4) * F.lit(0.0025), hi=100.0)),
        "pressure": round2((be_u16(payload, 6) + F.lit(50000)) / F.lit(100.0)),
        "acceleration_x": round3(be_i16(payload, 8) * F.lit(0.001)),
        "acceleration_y": round3(be_i16(payload, 10) * F.lit(0.001)),
        "acceleration_z": round3(be_i16(payload, 12) * F.lit(0.001)),
        "movement_counter": be_u8(payload, 16).cast("int"),
    }


def wrapped_delta(last: Column, first: Column, modulus: int = 256) -> Column:
    """A3: u8 ``wrapping_sub`` (utils.rs:69) as ``pmod(last - first, 256)``.

    Spark has no unsigned ints; pmod keeps the result in [0, modulus).
    """
    return F.pmod(last - first, F.lit(modulus)).cast("int")


def str_to_tag_map(col: Column) -> Column:
    """C1: ``"MAC=Name,MAC=Name"`` config parser (config.rs:36-53) as one builtin."""
    return F.str_to_map(
        F.regexp_replace(col, r"\s*,\s*", ","), F.lit(","), F.lit("=")
    )


def format_datetime(ts: Column) -> Column:
    """C2: ``DD.MM.YYYY - HH:MM:SS`` log format (utils.rs:12-16)."""
    return F.date_format(ts, "dd.MM.yyyy - HH:mm:ss")


def duration_seconds(t_start: Column, t_end: Column) -> Column:
    """C3: whole-second duration (utils.rs:21-23)."""
    return (F.unix_timestamp(t_end) - F.unix_timestamp(t_start)).cast("long")


def decode_format5_pandas():
    """Arrow-vectorized decoder: payload binary series → struct of fields.

    Returns a pandas UDF proving the multimodal/binary column story
    (FIXTURES.md A1); numerically identical to :func:`decode_format5`
    (tested). Prefer the expression version in production plans — this
    exists for the UDF surface (SURVEY.md §2.1) and as the template for
    decode steps builtins genuinely can't express.
    """
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.functions import pandas_udf

    schema = (
        "temperature double, humidity double, pressure double, "
        "acceleration_x double, acceleration_y double, acceleration_z double, "
        "movement_counter int"
    )

    def _round_half_up(arr: np.ndarray, ndigits: int) -> np.ndarray:
        # Match Spark's Round: BigDecimal on the shortest decimal repr,
        # HALF_UP. numpy's half-even on the binary value diverges at the
        # exact .5 reprs that raw*0.005 scale factors produce routinely.
        q = Decimal(1).scaleb(-ndigits)
        return np.array(
            [float(Decimal(repr(float(x))).quantize(q, ROUND_HALF_UP)) for x in arr]
        )

    @pandas_udf(schema)
    def decode(payload: pd.Series) -> pd.DataFrame:
        n = len(payload)
        out = {
            "temperature": np.full(n, np.nan),
            "humidity": np.full(n, np.nan),
            "pressure": np.full(n, np.nan),
            "acceleration_x": np.full(n, np.nan),
            "acceleration_y": np.full(n, np.nan),
            "acceleration_z": np.full(n, np.nan),
            "movement_counter": np.full(n, -1, dtype=np.int64),
        }
        valid_idx = [
            i
            for i, b in enumerate(payload)
            if b is not None and len(b) == PAYLOAD_LEN and b[0] == DATA_FORMAT
        ]
        if valid_idx:
            buf = np.frombuffer(
                b"".join(payload.iloc[i] for i in valid_idx), dtype=np.uint8
            ).reshape(-1, PAYLOAD_LEN)
            be = buf.astype(np.int64)
            u16 = lambda hi, lo: (be[:, hi] * 256 + be[:, lo]).astype(np.float64)  # noqa: E731
            i16 = lambda hi, lo: (  # noqa: E731
                (be[:, hi] * 256 + be[:, lo]).astype(np.uint16).astype(np.int16)
            ).astype(np.float64)
            idx = np.array(valid_idx)
            out["temperature"][idx] = _round_half_up(i16(1, 2) * 0.005, 2)
            out["humidity"][idx] = _round_half_up(np.minimum(u16(3, 4) * 0.0025, 100.0), 2)
            out["pressure"][idx] = _round_half_up((u16(5, 6) + 50000) / 100.0, 2)
            out["acceleration_x"][idx] = _round_half_up(i16(7, 8) * 0.001, 3)
            out["acceleration_y"][idx] = _round_half_up(i16(9, 10) * 0.001, 3)
            out["acceleration_z"][idx] = _round_half_up(i16(11, 12) * 0.001, 3)
            out["movement_counter"][idx] = buf[:, 15].astype(np.int64)
        df = pd.DataFrame(out)
        df["movement_counter"] = df["movement_counter"].astype("int32")
        return df

    return decode
