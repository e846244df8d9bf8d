"""Streaming sinks: idempotent upsert per micro-batch and watermarked
stream deduplication.

foreachBatch bridges the streaming plan to the batch upsert writer
(operators/upsert.py): each micro-batch merges by key, so replayed
batches (at-least-once sources, restarts) do not duplicate — the
streaming form of the reference's ON CONFLICT idempotency
(database.py:124-130, README1.md:128-132). dropDuplicates on a
watermarked stream bounds the dedup state: only keys within the
watermark horizon are remembered, which is the only dedup that works on
an unbounded stream."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        keys + [ts_col]
    )


def upsert_sink(
    stream_df: DataFrame,
    path: str,
    keys: list[str],
    order_col: str,
    checkpoint: str,
) -> StreamingQuery:
    """writeStream.foreachBatch -> merge_last_write_wins per micro-batch.
    Replaying a batch converges to the same table state (idempotent)."""
    from data_engineering_pipeline_spark.operators.upsert import upsert_parquet

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(batch_df.sparkSession, path, batch_df, keys, order_col)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
