"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``rust_ruuvitag_etl_spark.plans.registry``: every
implemented operator from SURVEY.md §2/§2.1 is registered there with a
(spark, sf_dir) -> DataFrame builder and (where SQL-expressible) a
DuckDB oracle string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rust_ruuvitag_etl_spark.plans import registry as _registry  # noqa: E402
from rust_ruuvitag_etl_spark.session import ensure_session_configs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the reference's full pipeline re-expressed over
    events) on sf0.001; driver checks rows>0."""
    ensure_session_configs(spark)
    return _registry.REGISTRY["ruuvi_flagship"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_configs(spark)
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(q.fn) for name, q in _registry.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return _registry.oracle_sql()
