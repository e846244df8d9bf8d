"""Parquet table readers (op-scan-ordered; reference database.py:143-157).

The reference's `load_raw_records` does `SELECT * ... ORDER BY` and pulls
everything to the driver. In Spark the scan stays lazy and distributed;
ordering is applied only when an ordered result is actually consumed
(global sorts are a shuffle — don't pay for one you don't need).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_pipeline_spark.schemas import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Column pruning + predicate pushdown reach
    the parquet scan because this returns the bare lazy scan."""
    # Defensive session confs, set here (they're dynamic) so sessions NOT
    # built by get_spark() — e.g. the driver's own — behave identically:
    # UTC pins NTZ-timestamp -> epoch conversions (unix_micros) to the
    # values the DuckDB oracles produce regardless of host timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # TIMESTAMP(NANOS) parquet: Spark rejects it unless read as int64
        # nanos.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # TIMESTAMP(NANOS) read as int64 nanos (nanosAsLong): convert
            # to a microsecond timestamp JVM-side; truncation matches
            # DuckDB's ns->us cast.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # timestamp[us] with no timezone reads as TIMESTAMP_NTZ, which
            # unix_micros() rejects. Under the UTC session pinned above,
            # cast("timestamp") reinterprets the same wall-clock instants
            # and matches DuckDB's epoch_us(CAST(ts AS TIMESTAMP)) exactly.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}
