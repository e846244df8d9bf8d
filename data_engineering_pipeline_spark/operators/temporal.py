"""Temporal join operators Spark lacks natively: as-of join and range
join, built as compositions of existing DataFrame ops (SURVEY-style
custom operators — no Python, no UDFs, no nested-loop joins).

- as_of_join: for each left row, the latest right row with
  right_ts <= left_ts per key. NOT implemented as an inequality join
  (BroadcastNestedLoop — quadratic): both sides are UNIONED, sorted once
  per key by (ts, side), and `last(value, ignorenulls=True)` over the
  running window carries the most recent right value onto every left
  row. One shuffle, linear state — the standard scalable formulation.
- range_join_bucketed: pairs within |left_ts - right_ts| <= delta per
  key. The right side is bucketed by ts div delta; each left row probes
  buckets {b-1, b, b+1} (any in-range partner must land there), then the
  exact predicate filters. Equi-join mechanics (hash/sort-merge) at 3x
  left fan-out instead of a nested-loop range scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Left as-of join. `left` and `right` share `keys` + `ts_col`;
    `value_cols` exist only on `right` and arrive on every left row as
    the latest at-or-before value (null when no prior right row). A
    right row AT the same timestamp matches (ties order right first).

    Caveats of the union+last formulation (r9 review, documented):
    a NULL in a right row's value column is indistinguishable from a
    left placeholder, so `last(ignorenulls)` carries the PREVIOUS
    non-null value past it (and with several value_cols a partly-null
    right row yields a mixed-generation result row) — feed complete
    right rows, or encode absent-as-sentinel upstream. Two right rows
    sharing (keys, ts) are tie-broken arbitrarily — dedup the right
    side first (the same contract pandas merge_asof has)."""
    right_types = {c: right.schema[c].dataType for c in value_cols}
    l = left.withColumn("__is_left", F.lit(1))
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(right_types[c]))
    r = right.select(*keys, ts_col, *value_cols).withColumn(
        "__is_left", F.lit(0)
    )
    left_only = [
        c for c in left.columns if c not in set(keys + [ts_col])
    ]
    for c in left_only:
        r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r.select(l.columns))

    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, "__is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__is_left") == 1).drop("__is_left")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    delta: int,
) -> DataFrame:
    """All (left, right) pairs with |left_ts - right_ts| <= delta per
    key (ts columns are integer epochs, e.g. µs). Inner semantics: each
    right row lands in exactly one bucket and each left row probes 3, so
    every in-range pair appears exactly once; re-attach unmatched left
    rows with a left join on the aggregated result if needed."""
    r = right.withColumn("__b", F.expr(f"{right_ts} div {delta}"))
    probe = F.explode(
        F.array(*[F.expr(f"{left_ts} div {delta}") + F.lit(i) for i in (-1, 0, 1)])
    )
    l = left.withColumn("__b", probe)
    in_range = F.abs(F.col(left_ts) - F.col(right_ts)) <= delta
    return l.join(r, [*keys, "__b"], "inner").filter(in_range).drop("__b")
