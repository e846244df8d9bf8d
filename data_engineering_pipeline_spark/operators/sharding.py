"""Deterministic global shuffle + shard export — the last step of a
training-data pipeline: turn a curated corpus into N shards whose
assignment AND within-shard order are pure functions of the data, so
the exact same shards come off a laptop or a 1000-executor cluster,
any shard can be rebuilt alone after a lost file, and an external
engine can verify the layout row for row.

df.repartition(N) + write would give none of that: Spark's shuffle is
round-robin over whatever partitioning the input happened to have, so
the shard contents change with cluster size and rerun. Here both
decisions come from the multiplicative key hash
(operators/sampling.py key_hash — exact int64 arithmetic, reproducible
in DuckDB):

    shard(row)  = hash(epoch, key...) % n_shards
    order(row)  = (hash, key...)      within its shard

`epoch` folds into the hash, so epoch 2 is a genuinely different
permutation of the same corpus with zero extra state — the standard
"reshuffle every epoch" without persisting a permutation table.

Scale: one hash-partition shuffle (the unavoidable one — data must
physically move to its shard), map-side everything else. The hash is
uniform, so shards are balanced by construction (~N/n_shards +-
binomial noise) — no skewed-writer straggler. Interleaving comes free:
a hash ignores source/domain, so every shard gets the corpus mixture
rather than runs of one crawl.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.sampling import key_hash


def shuffle_shard(
    df: DataFrame, n_shards: int, *keys: Column, epoch: int = 0
) -> DataFrame:
    """Adds `shard` (int, 0..n_shards-1) and `__h` (the shuffle hash).
    Narrow — no shuffle happens until something groups or writes by
    shard."""
    h = key_hash(F.lit(epoch), *keys)
    return df.withColumn("__h", h).withColumn(
        "shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int")
    )


def export_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    keys: list[str],
    epoch: int = 0,
) -> None:
    """Write the corpus as `path/shard=K/` parquet, each shard sorted
    in shuffle order. repartition on the shard id moves each row
    exactly once; sortWithinPartitions orders rows inside each writer
    task, so every file is in deterministic (hash, key) order."""
    sh = shuffle_shard(
        df, n_shards, *[F.col(k) for k in keys], epoch=epoch
    )
    (
        sh.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "__h", *keys)
        .drop("__h")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def shard_manifest(
    df: DataFrame, n_shards: int, *keys: Column, epoch: int = 0
) -> DataFrame:
    """Per-shard audit frame: row count and the first rows in shuffle
    order — what a training loader checks before trusting a layout.
    One shuffle (the window by shard)."""
    sh = shuffle_shard(df, n_shards, *keys, epoch=epoch)
    w = Window.partitionBy("shard").orderBy("__h", *keys)
    return (
        sh.withColumn("pos", F.row_number().over(w))
        .withColumn(
            "n_docs", F.count(F.lit(1)).over(Window.partitionBy("shard"))
        )
    )
