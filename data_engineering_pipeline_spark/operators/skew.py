"""Skew-handling utilities: salting for hot keys, bucketed table writes
for co-located (shuffle-free) joins, and partitioned layouts for
partition pruning.

AQE's skew-join splitting (on by default, session.py) handles most skew
at runtime; explicit salting is for the cases AQE can't fix — a skewed
AGGREGATION (one giant group) or a skewed broadcast-ineligible join key
known in advance. Bucketing and partitioning are layout-time decisions:
they trade one write-side shuffle for zero shuffle on every subsequent
join/scan — the dominant win when a 100 TB fact table is joined daily."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[Column],
    reaggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation around a salt: groupBy(keys + salt) computes
    partials in parallel even when one key dominates, then the tiny
    per-salt partials re-aggregate to the final per-key result.

    `aggs` are the salted-phase aggregates (must be decomposable —
    sum/count/min/max), `reaggs` the merge phase over the partial
    columns. Example:
        salted_agg(df, ["k"],
                   [F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")],
                   [F.sum("s").alias("v_sum"), F.sum("c").alias("n")])
    """
    salted = df.withColumn(
        "__salt", F.floor(F.rand(seed=0) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*aggs)
    return partial.groupBy(*keys).agg(*reaggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skewed-side salted equi-join: the skewed side gets a random salt
    in [0, B); the small side is exploded B times so every (key, salt)
    pair still matches. Spreads a hot key over B tasks at the cost of
    replicating the small side B times — use when the small side is too
    big to broadcast but far smaller than the skewed side."""
    left = skewed.withColumn(
        "__salt", F.floor(F.rand(seed=0) * salt_buckets).cast("int")
    )
    right = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return left.join(right, [key, "__salt"]).drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    num_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed table: both sides of a future equi-join on
    `bucket_by` bucketed with the same bucket count join WITHOUT a
    shuffle (co-located join) — the layout pays the shuffle once at
    write time."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table_name)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned layout: scans filtered on partition_cols
    prune whole directories (PartitionFilters in the scan node), the
    cheapest IO reduction there is at 100 TB."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
