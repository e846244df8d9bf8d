"""Windowed event-analytics queries (batch form) over the events table.

These are the batch twins of the Structured Streaming operators in
data_engineering_pipeline_spark/streaming/ — same window semantics, so
the oracle that checks the batch plan also pins down the streaming one
(streaming tests assert stream output == batch output on the same data).

Timestamps are compared in epoch MICROSECONDS (bigint) throughout:
events.parquet stores TIMESTAMP(NANOS); both engines truncate ns -> us
identically, and integer epochs dodge timezone/precision hashing hazards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.sources import load_table

QUERIES = {}
ORACLES = {}

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_register(
    "events-window-tumbling",
    """
    SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) * 3600
             AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS value_sum
    FROM events
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def events_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window aggregation per event type, via Spark's
    native window() operator (the streaming-compatible form)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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
        .orderBy("window_start", "event_type")
    )


@_register(
    "events-window-sliding",
    """
    WITH offsets AS (SELECT unnest([0, 1]) AS k),
    assigned AS (
      SELECT ((epoch_us(CAST(e.ts AS TIMESTAMP)) - k.k * 1800000000)
               // 3600000000) * 3600 + k.k * 1800 AS window_start,
             e.event_type, e.value
      FROM events e CROSS JOIN offsets k
    )
    SELECT window_start, event_type, count(*) AS n_events,
           round(sum(value), 4) AS value_sum
    FROM assigned
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def events_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min (each event lands in exactly
    two windows); the oracle assigns both windows arithmetically."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
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
        .orderBy("window_start", "event_type")
    )


@_register(
    "events-sessionize",
    f"""
    WITH e AS (
      SELECT user_id, event_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events
    ), marked AS (
      SELECT *, CASE WHEN lag(us) OVER w IS NULL
                       OR us - lag(us) OVER w > {SESSION_GAP_US}
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), sessions AS (
      SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           count(*) AS n_events,
           round(sum(value), 4) AS value_sum,
           min(us) AS start_us, max(us) AS end_us
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_no
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization per user (gaps-and-islands). The
    streaming twin uses session_window() — same session boundaries."""
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    marked = e.withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | (F.col("us") - F.lag("us").over(w) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sessions = marked.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        sessions.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .orderBy("user_id", "session_no")
    )
