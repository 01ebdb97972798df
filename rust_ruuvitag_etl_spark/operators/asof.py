"""As-of (point-in-time) join — the time-series join the reference's
ordered first/last semantics (A3) generalize to (SURVEY.md §2.1).

Implementation: union the two sides, one shuffle on the key, and a
running ``last(..., ignorenulls)`` window fills each left row with the
most recent right row at-or-before its timestamp. This is the
scale-correct plan: ONE shuffle + ONE per-partition sort, no range
join explosion, no per-key driver loop; skewed keys are split by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_value_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (backward as-of, inclusive), per key.

    Right rows should be unique per (key, ts) for deterministic output —
    pre-aggregate otherwise. Output: all left columns + each right value
    column renamed ``{col}{suffix}`` (NULL when no prior right row).
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts_col)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    ).select(*lcols, "_side", *[f"{c}{suffix}" for c in right_value_cols])

    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at equal timestamps → inclusive
    # (<=) semantics, matching SQL ASOF JOIN.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_value_cols: tuple[str, ...] = (),
    suffix: str = "_next",
) -> DataFrame:
    """For each left row, attach the EARLIEST right row with
    ``right.ts >= left.ts`` (forward as-of, inclusive), per key — the
    next-event attribution direction (e.g. "first purchase at-or-after
    each view"). Same single-shuffle union plan as :func:`asof_join`
    with the traversal reversed: the running fill walks timestamps
    DESCENDING, so the nearest following right row is the last non-null
    seen. Right rows should be unique per (key, ts); NULL when no later
    right row exists.
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_value_cols],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key, ts_col)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_value_cols],
    ).select(*lcols, "_side", *[f"{c}{suffix}" for c in right_value_cols])

    unioned = l_tagged.unionByName(r_tagged)
    # Descending timestamps; right rows (side 0) sort before left rows
    # at equal timestamps → inclusive (>=) semantics.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).desc(), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in right_value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
