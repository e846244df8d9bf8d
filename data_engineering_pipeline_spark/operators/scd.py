"""Slowly-changing-dimension type 2 (SCD2): versioned dimension rows
with [valid_from, valid_to) intervals, the standard way a warehouse
tracks attribute history (the reference's upsert, database.py:119-135,
is the type-1 "overwrite" form; this is its history-keeping sibling).

Two forms, one semantics:

- scd2_history: REBUILD the full version table from an update log —
  two window passes per key (change-detect via lag, interval-close via
  lead). One shuffle on the key; at 100 TB this is the backfill path.
- scd2_merge: INCREMENTAL — fold a new batch of updates into an
  existing SCD2 table without touching closed rows: closed versions
  pass through untouched, each key's open row is replayed as the seed
  update, and only (seed + new updates) go through the history
  rebuild. Per-batch cost is batch-sized, not history-sized. Late
  updates (ts before a key's open valid_from) are the documented
  caveat, as in any incremental SCD2.

Invariant (tested): merge(history(b1), b2) == history(b1 + b2) for a
per-key time-ordered batch split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _changed(attr_cols: list[str], w) -> Column:
    """True on the first row per key and whenever any attribute differs
    from the previous update (null-safe)."""
    first = F.row_number().over(w) == 1
    diff = F.lit(False)
    for a in attr_cols:
        diff = diff | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    return first | diff


def scd2_history(
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Full SCD2 rebuild from an update log. Output: key_cols +
    attr_cols + (valid_from, valid_to), valid_to null on each key's
    open (current) version. Updates that change nothing are dropped;
    ties on ts are sequenced by tiebreak_col (deterministic)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    changed = updates.withColumn("__chg", _changed(attr_cols, w)).filter(
        F.col("__chg")
    )
    # lead over the CHANGED rows only: each version runs until the next
    # actual change, not the next raw update
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    return changed.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Fold `updates` into an existing SCD2 `current` table (schema as
    produced by scd2_history). Closed versions are immutable and pass
    through without a shuffle on their data; each key's open row seeds
    the rebuild so an unchanged-attribute update remains a no-op and a
    changed one closes the open interval at the update's ts."""
    closed = current.filter(F.col("valid_to").isNotNull())
    # the open row replayed as the earliest update of its key: tiebreak
    # -1 sorts it before any real update sharing its timestamp
    seed = current.filter(F.col("valid_to").isNull()).select(
        *key_cols,
        *attr_cols,
        F.col("valid_from").alias(ts_col),
        F.lit(-1).cast("long").alias(tiebreak_col),
    )
    # r9 review: the seed claims tiebreak -1 to sort before any real
    # update sharing the open row's timestamp — an update with a
    # NEGATIVE tiebreak could sort before the seed and silently
    # reorder history around it; reject instead of corrupting
    tb = F.col(tiebreak_col).cast("long")
    u = updates.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col),
        # r10 (ADVICE): route NULL tiebreaks to the error branch
        # EXPLICITLY — with a plain `tb >= 0` guard a NULL made the
        # predicate NULL, fell through to otherwise, and the concat
        # with a NULL cast nulled the whole message, so raise_error
        # fired with an opaque null text
        F.when(
            tb.isNull() | (tb < 0),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"scd2_merge: {tiebreak_col!r} must be >= 0 "
                        "(the replayed open row reserves -1), got "
                    ),
                    F.coalesce(tb.cast("string"), F.lit("NULL")),
                )
            ),
        )
        .otherwise(tb)
        .alias(tiebreak_col),
    )
    rebuilt = scd2_history(
        seed.unionByName(u), key_cols, attr_cols, ts_col, tiebreak_col
    )
    return closed.unionByName(rebuilt)
