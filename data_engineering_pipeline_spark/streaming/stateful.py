"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 extension — the escape hatch when built-in windowed
aggregations can't express the semantics).

`running_user_totals` keeps one running accumulator per user across
micro-batches: cumulative event count, cumulative value sum, and the
last-seen event time, emitting one updated row per user per batch. The
state (GroupState) lives in the state store, partitioned by user —
bounded by the key cardinality, checkpointed with the query, and at
scale sharded across executors like any keyed state.

The closure only touches pandas + locals (cloudpickle ships it by value;
workers don't import this package — same rule as operators/multimodal)."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, value_sum double, last_us bigint"
STATE_SCHEMA = "n bigint, total double, last_us bigint"


def running_user_totals(events: DataFrame) -> DataFrame:
    """events (with `ts` timestamp) -> one row per user per micro-batch
    with cumulative totals."""

    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        n, total, last_us = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = int(pdf["ts"].astype("int64").max()) // 1000
            last_us = max(last_us, batch_max)
        # state keeps the UNROUNDED accumulator — rounding is display-only
        # on the emitted row; re-rounding state every micro-batch would
        # accumulate up to 5e-5 drift per batch into the running sum
        state.update((n, total, last_us))
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_events": n,
                    "value_sum": round(total, 4),
                    "last_us": last_us,
                }
            ]
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
