"""JDBC source/sink — the reference's raw/cleaned layers live in
PostgreSQL (database.py:60-71); this is that path for Spark, built
around PARALLEL reads: a naive spark.read.jdbc is one connection on one
executor, which at any real table size is the bottleneck. The helpers
here always partition the read (numPartitions concurrent connections,
each scanning a [lowerBound, upperBound) slice of partition_column —
use the table's keyspace, e.g. the reference's SERIAL id).

No live database exists in this environment, so tests cover the option
assembly (tests/test_formats.py); the read itself is standard
spark.read.format("jdbc").load()."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_read_options(
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    **extra: str,
) -> dict[str, str]:
    """Option dict for a partitioned JDBC read. `fetchsize` matters:
    drivers default to tiny row batches (PostgreSQL streams only with a
    nonzero fetchsize inside a transaction)."""
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetch_size),
    }
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned read needs lower/upper bounds")
        opts.update(
            {
                "partitionColumn": partition_column,
                "lowerBound": str(lower_bound),
                "upperBound": str(upper_bound),
                "numPartitions": str(num_partitions),
            }
        )
    opts.update(extra)
    return opts


def read_jdbc(spark: SparkSession, **kwargs) -> DataFrame:
    return spark.read.format("jdbc").options(**jdbc_read_options(**kwargs)).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 500,
    **extra: str,
) -> None:
    """Batched JDBC append (batchsize mirrors the reference's
    execute_batch page_size=500, database.py:135). For upsert semantics
    against a constraint-bearing table, stage-append then server-side
    MERGE — Spark's JDBC writer has no ON CONFLICT."""
    (
        df.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .options(**extra)
        .save()
    )
