"""Declarative table DDL (op-sink-ddl; reference database.py:31-55,76-81
and transformer.py:36-55 — CREATE TABLE IF NOT EXISTS with fixed
schemas).

In Spark the schema usually rides along with `df.write`, but an explicit
catalog entry gives the same declare-before-load shape the reference
uses: external Parquet tables registered with an explicit StructType, so
downstream SQL can reference them by name and schema drift fails fast at
write time (the writer validates against the declared schema)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def create_table_if_not_exists(
    spark: SparkSession, name: str, schema: T.StructType, path: str
) -> bool:
    """CREATE TABLE IF NOT EXISTS name (...) USING PARQUET LOCATION path.
    Returns True when newly created, False when it already existed
    (idempotent, like database.py:31's IF NOT EXISTS)."""
    existed = spark.catalog.tableExists(name)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({schema.toDDL()}) "
        f"USING PARQUET LOCATION '{path}'"
    )
    return not existed


def drop_table(spark: SparkSession, name: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
