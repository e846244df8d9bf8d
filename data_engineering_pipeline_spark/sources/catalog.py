"""SQL catalog: expose the testdata tables as temp views so arbitrary
Spark SQL runs against them — the reference's user interface IS SQL
strings (transformer.py:59-72 ships one to PostgreSQL), so a drop-in
engine must accept ad-hoc SQL, not only the named query registry.

`register_views(spark, sf_dir)` + `spark.sql(...)` is the whole API;
every reader quirk (nanos timestamps, UTC normalization) is inherited
from load_table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from data_engineering_pipeline_spark.schemas import TESTDATA_TABLES
from data_engineering_pipeline_spark.sources.tables import load_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each parquet table as a session temp view named after
    the table. Returns the registered names. Idempotent (replaces)."""
    names = list(tables) if tables is not None else list(TESTDATA_TABLES)
    for t in names:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return names
