"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``data_engineering_pipeline_spark``; this module
only aggregates the query registry (SURVEY.md §2 op ids + headline
queries + extension ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_pipeline_spark.queries import collect_registry  # noqa: E402

_QUERIES, _ORACLES = collect_registry()

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference-parity pipeline (SURVEY.md §7.1): join two keyed
    time-series → drop-null → lag1 + two min-periods-gated 5-row rolling
    means → round → ordered result.
    """
    from data_engineering_pipeline_spark.queries.parity import parity_pipeline

    return parity_pipeline(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry."""
    return dict(_ORACLES)
