"""Structured Streaming operators over event streams (SURVEY.md §2.9 —
extension territory: the reference is strictly batch; the `events` table
is stream-shaped on purpose).

Each transformation here is the streaming twin of a batch query in
queries/streaming_batch.py: identical window semantics, so the DuckDB
oracle that pins the batch plan also pins these (and
tests/test_streaming.py asserts stream output == batch output on the
same files, which is the Structured Streaming correctness idiom).

Watermarks bound state: at scale, `withWatermark` is what lets the
windowed aggregations and session windows evict state instead of growing
without bound; late events beyond the watermark are dropped, matching
the batch results only for data within the lateness budget."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Static fallback schema for an EMPTY landing directory (the stream is
# allowed to start before the first upstream file lands). ts is NTZ —
# the driver's current parquet encoding; the nanos-as-long encoding can
# only be detected from real footers, at which point the probe below
# sees it anyway on restart.
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over landed event parquet files. New files in
    `path` become micro-batches; at scale this is the landing-zone
    pattern (upstream writers drop files; Spark tails the directory).

    The stream schema is probed from the files already present (a batch
    footer read — driver-side metadata only, no data scan), because the
    `ts` physical encoding has shipped both as TIMESTAMP(NANOS) (reads as
    int64 under nanosAsLong) and as timestamp[us] with no timezone (reads
    as TIMESTAMP_NTZ). Both normalize to a session-TZ TIMESTAMP column so
    every downstream watermark/window/unix_micros sees one type. An
    EMPTY directory (no parquet footers to probe) falls back to the
    static EVENTS_RAW_SCHEMA instead of failing — the landing-zone
    pattern starts the stream before the first file lands."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        schema = spark.read.parquet(path).schema
    except Exception:  # AnalysisException: unable to infer schema
        schema = EVENTS_RAW_SCHEMA
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )
    ts_type = schema["ts"].dataType
    if isinstance(ts_type, T.LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, T.TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event type with bounded state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def session_aggregates(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Native session windows (session_window merges events within `gap`
    per user — the streaming-stateful form of the batch gaps-and-islands
    sessionization in queries/streaming_batch.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            "n_events",
            "value_sum",
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain the stream with availableNow (process-everything-then-stop)
    into an in-memory table named `query_name` — the test/demo sink."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def enrich_with_dimension(
    stream: DataFrame, dim: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """Stream-static join: enrich each micro-batch with a (broadcast)
    dimension table — the standard pattern for attaching reference data
    to a stream. The static side is re-resolved per micro-batch, so a
    refreshed dimension table is picked up without restarting the
    query."""
    return stream.join(F.broadcast(dim), on, how)


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STREAM inner join: attribute each purchase to the clicks
    by the same user within the preceding `horizon_minutes` — the
    ad-attribution shape, and the canonical watermarked interval join.

    Both sides carry watermarks and the join condition bounds purchase
    ts to [click ts, click ts + horizon], so Spark can evict click
    state once the purchase-side watermark passes click ts + horizon
    and purchase state once the click-side watermark passes purchase
    ts — without the time bound, stream-stream state grows forever.
    At scale the join keys hash-partition both streams; state is
    per-key rows within the horizon, independent of stream length."""
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("amount"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon_minutes} MINUTES")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.unix_micros("click_ts").alias("click_us"),
        F.unix_micros("purchase_ts").alias("purchase_us"),
        "amount",
    )
