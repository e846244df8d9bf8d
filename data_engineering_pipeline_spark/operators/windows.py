"""Window-feature builders — the heart of the reference (SURVEY.md §2.5).

The reference computes lag(1) and 5-row trailing means with a
min-periods=3 gate in driver-side Python over per-country lists
(transformer.py:84-119). Here the same semantics are built-in window
expressions: one shuffle by the partition key, in-partition sort, then
whole-stage-codegen'd window evaluation — no Python in the hot path.

Semantics preserved exactly (SURVEY.md §7.3):
- row-based frames (last 5 *rows*, not last 5 range units) — gaps created
  by upstream filtering shift the frame, matching the reference;
- the min-periods gate: plain avg().over() would emit values for the first
  two rows of each group that the reference nulls out (transformer.py:104);
- round(x, 4) on outputs (transformer.py:104-113).
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F

ColumnOrName = Column | str


def ordered_window(partition_by: list[ColumnOrName], order_by: list[ColumnOrName]) -> WindowSpec:
    """`Window.partitionBy(keys).orderBy(time)` — the shared spec for all
    reference features (transformer.py:87-93 group+sort)."""
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def lag_feature(col: ColumnOrName, w: WindowSpec, offset: int = 1, scale: int | None = 4) -> Column:
    """lag(offset) within the window; null for the first rows of each
    partition (transformer.py:99, op-window-lag1)."""
    out = F.lag(col, offset).over(w)
    return F.round(out, scale) if scale is not None else out


def rolling_mean(
    col: ColumnOrName,
    w: WindowSpec,
    window_rows: int = 5,
    min_periods: int = 3,
    scale: int | None = 4,
) -> Column:
    """Trailing mean over the last `window_rows` rows, null unless the
    frame holds >= `min_periods` non-null values (transformer.py:101-105,
    op-window-roll5-*). avg/count are null-ignoring, matching the
    reference's `if v is not None` filter."""
    frame = w.rowsBetween(-(window_rows - 1), 0)
    gated = F.when(
        F.count(col).over(frame) >= min_periods, F.avg(col).over(frame)
    )
    return F.round(gated, scale) if scale is not None else gated
