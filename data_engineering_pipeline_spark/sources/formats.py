"""File-format sources/sinks beyond parquet: CSV and JSON-lines readers
with explicit schemas and corrupt-record quarantine, plus layout-aware
writers.

Malformed-row policy mirrors the ingestion stage (database.py:104-111 —
skip-and-log): PERMISSIVE mode routes unparseable rows to a corrupt-
record column instead of failing the job, and `split_corrupt` separates
them for auditing — at 100 TB a FAILFAST read is a denial of service
against yourself."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """Schema-enforced CSV read; unparseable rows land in _corrupt_record."""
    return spark.read.csv(
        path,
        schema=_schema_with_corrupt(schema),
        header=header,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
        **options,
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType, **options: str
) -> DataFrame:
    """Schema-enforced JSON-lines read with corrupt-record capture."""
    return spark.read.json(
        path,
        schema=_schema_with_corrupt(schema),
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
        **options,
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): quarantine keeps the raw corrupt text plus
    the (null) parsed columns — Spark disallows plans whose scan
    references ONLY the corrupt-record column, so the quarantine side
    must carry at least one data column through.

    The parsed frame is cache()d (both branches share one parse); the
    cache lives until the session evicts it — callers processing many
    inputs in one session should unpersist() either branch when done
    (r9 review note)."""
    # Column pruning would reduce downstream quarantine queries (e.g. a
    # bare count) to referencing only the corrupt column, which Spark
    # disallows against raw CSV/JSON scans — caching the parsed frame is
    # the documented resolution and also avoids double-parsing the input
    # for the two branches.
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    data_cols = [c for c in df.columns if c != CORRUPT_COL]
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"), *data_cols
    )
    return clean, quarantine


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    compression: str = "zstd",
    partition_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Layout-aware writer: columnar format + zstd by default; optional
    hive partitioning and file-size bounding (maxRecordsPerFile keeps
    individual files splittable-friendly at large scale)."""
    w = df.write.mode(mode).format(fmt).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.save(path)
