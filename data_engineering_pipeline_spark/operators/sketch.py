"""Mergeable set sketches for corpus-level comparisons.

corpus_overlap_bottomk(): pairwise Jaccard similarity between document
GROUPS (sources, snapshots, crawls) from bottom-k sketches of their
shingle-hash sets. The estimator is the classic one (Broder 1997;
Cohen & Kaplan 2007): the k smallest hashes of A ∪ B are a uniform
sample of the union, so |bottom-k(A ∪ B) ∩ sk(A) ∩ sk(B)| / k is an
unbiased Jaccard estimate with standard error ~ 1/sqrt(k).

Why this shape at 100 TB: the full per-group shingle sets are corpus
sized, but the sketch is k rows per group — built in ONE pass (hash,
distinct, per-group bottom-k) and compared pairwise afterwards at
O(G^2 * k) cost that never touches the corpus again. That makes
questions like "how much does crawl N overlap crawl N-1" or "which
sources are near-copies of each other" answerable from kilobytes of
state. The sketches are mergeable (union = bottom-k of concatenation),
so they can be maintained incrementally per batch.

The group-pair enumeration is intentionally quadratic IN GROUPS (not
rows): G is sources/crawls — hundreds, not billions. Pairs are built
with a constant-key equi-join (not crossJoin) so the physical plan
stays a hash join: the pair frame is G rows a side.

Hashing: xxhash64 by default (JVM intrinsic, scale path); pass
`shingle_hash=portable_token_hash` (operators/dedup.py) for the graded
query so a DuckDB oracle reproduces the sketch bit-for-bit. Distinct
is taken on the HASH (collisions fold identically in both engines).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.dedup import (
    _exploded_shingles,
)


def bottomk_sketch(
    df: DataFrame,
    group_col: str,
    text_col: str,
    k: int = 128,
    n: int = 3,
    shingle_hash: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """(group, h): the k smallest distinct shingle hashes per group.

    One corpus pass: tokenize -> n-word shingles -> hash -> distinct ->
    per-group bottom-k. The row_number window shuffles only (group, h)
    pairs — 8-byte keys, already distinct-reduced map-side."""
    hasher = shingle_hash or F.xxhash64
    ex = _exploded_shingles(df, group_col, text_col, n)
    hs = ex.select(
        F.col(group_col).alias("group"), hasher(F.col("shingle")).alias("h")
    ).distinct()
    w = Window.partitionBy("group").orderBy("h")
    return (
        hs.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def sketch_jaccard_pairs(sketch: DataFrame, k: int) -> DataFrame:
    """Pairwise Jaccard estimates from a bottomk_sketch() output.

    For each group pair (a < b): take the k smallest hashes of the
    UNION of the two sketches (a uniform sample of A ∪ B, because each
    side's sketch contains every union-minimum candidate it owns), and
    count members present in BOTH sketches. Output:
    (group_a, group_b, n_sample, n_both, j_est), deterministic given
    the hash — j_est = n_both / n_sample in exact IEEE division."""
    groups = sketch.select(F.col("group")).distinct().withColumn(
        "__one", F.lit(1)
    )
    pairs = (
        groups.select(F.col("group").alias("ga"), "__one")
        .join(groups.select(F.col("group").alias("gb"), "__one"), "__one")
        .filter(F.col("ga") < F.col("gb"))
        .drop("__one")
    )
    am = pairs.join(
        sketch.withColumnRenamed("group", "ga"), "ga"
    ).select("ga", "gb", "h", F.lit(1).alias("ia"), F.lit(0).alias("ib"))
    bm = pairs.join(
        sketch.withColumnRenamed("group", "gb"), "gb"
    ).select("ga", "gb", "h", F.lit(0).alias("ia"), F.lit(1).alias("ib"))
    u = (
        am.unionByName(bm)
        .groupBy("ga", "gb", "h")
        .agg(F.max("ia").alias("ia"), F.max("ib").alias("ib"))
    )
    wu = Window.partitionBy("ga", "gb").orderBy("h")
    samp = u.withColumn("__rk", F.row_number().over(wu)).filter(
        F.col("__rk") <= k
    )
    return (
        samp.groupBy(F.col("ga").alias("group_a"), F.col("gb").alias("group_b"))
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.sum(F.col("ia") * F.col("ib")).alias("n_both"),
        )
        .select(
            "group_a",
            "group_b",
            "n_sample",
            "n_both",
            (
                F.col("n_both").cast("double")
                / F.col("n_sample").cast("double")
            ).alias("j_est"),
        )
    )


def corpus_overlap_bottomk(
    df: DataFrame,
    group_col: str,
    text_col: str,
    k: int = 128,
    n: int = 3,
    shingle_hash: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """Pairwise corpus-overlap (Jaccard) estimates between all groups:
    bottomk_sketch + sketch_jaccard_pairs in one call."""
    return sketch_jaccard_pairs(
        bottomk_sketch(df, group_col, text_col, k, n, shingle_hash), k
    )
