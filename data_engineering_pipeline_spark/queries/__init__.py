"""Query registry: every module contributes QUERIES (name -> callable
(spark, sf_dir) -> DataFrame) and ORACLES (name -> DuckDB SQL string).
`__spark_entry__.py` aggregates these for the driver's correctness gate."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from data_engineering_pipeline_spark.queries import (
        operators as ops_mod,
        parity,
        tpch,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (parity, ops_mod, tpch):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    for mod_name in (
        "dedup",
        "text",
        "similarity",
        "streaming_batch",
        "multimodal",
        "extra",
        "temporal",
        "search",
    ):
        try:
            mod = __import__(
                f"data_engineering_pipeline_spark.queries.{mod_name}",
                fromlist=["QUERIES", "ORACLES"],
            )
            queries.update(mod.QUERIES)
            oracles.update(mod.ORACLES)
        except Exception as exc:  # noqa: BLE001 — one broken module must
            # not take down the whole registry (the driver grades what
            # loads); tests still surface the failure loudly.
            import warnings

            warnings.warn(f"query module {mod_name} failed to load: {exc}")
            continue
    return queries, oracles
