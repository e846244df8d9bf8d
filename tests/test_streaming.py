"""Structured Streaming correctness: drain the events stream with
availableNow and assert the result equals the batch twin on the same
data — the standard stream/batch-parity idiom."""

from __future__ import annotations

import shutil

import pytest

from data_engineering_pipeline_spark.queries.streaming_batch import (
    events_window_tumbling,
)
from data_engineering_pipeline_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_aggregates,
    tumbling_counts,
)


@pytest.fixture()
def events_dir(tmp_path, sf_smoke):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_stream_tumbling_equals_batch(spark, sf_smoke, events_dir):
    stream = tumbling_counts(read_events_stream(spark, events_dir))
    run_to_memory(stream, "tumbling_out")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    expected = {
        (r.window_start, r.event_type): (r.n_events, r.value_sum)
        for r in events_window_tumbling(spark, sf_smoke).collect()
    }
    assert got == expected


def test_stream_sessions_bounded_and_consistent(spark, events_dir):
    stream = session_aggregates(read_events_stream(spark, events_dir))
    run_to_memory(stream, "sessions_out")
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    assert len(rows) > 0
    # every session is non-empty and value_sum is finite
    assert all(r.n_events >= 1 for r in rows)
    # per-user session starts strictly increase
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.start_us)
    for starts in by_user.values():
        s = sorted(starts)
        assert s == sorted(set(starts))


def test_stream_static_enrichment_matches_batch(spark, sf_smoke, events_dir):
    from data_engineering_pipeline_spark.sources import load_table
    from data_engineering_pipeline_spark.streaming.events import (
        enrich_with_dimension,
    )
    from pyspark.sql import functions as F

    # dimension: per-user segment derived from user_id
    dim = spark.range(0, 200).select(
        F.col("id").alias("user_id"),
        (F.col("id") % 3).cast("int").alias("segment"),
    )
    stream = enrich_with_dimension(
        read_events_stream(spark, events_dir), dim, ["user_id"]
    ).groupBy("segment").count()
    q = (
        stream.writeStream.format("memory")
        .queryName("enriched")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.segment: r["count"] for r in spark.sql("SELECT * FROM enriched").collect()}
    expected = {
        r.segment: r["count"]
        for r in load_table(spark, sf_smoke, "events")
        .join(dim, ["user_id"])
        .groupBy("segment")
        .count()
        .collect()
    }
    assert got == expected


def test_stream_stream_join_equals_batch(spark, sf_smoke, events_dir):
    """Watermarked stream-stream interval join == the same join run in
    batch over the same files (all events fall inside the lateness
    budget, so nothing is dropped)."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_spark.sources import load_table
    from data_engineering_pipeline_spark.streaming.events import (
        click_purchase_attribution,
    )

    ev = read_events_stream(spark, events_dir)
    joined = click_purchase_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    run_to_memory(joined, "attribution_out", output_mode="append")
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM attribution_out").collect()
    )

    batch = load_table(spark, sf_smoke, "events")
    expected = sorted(
        tuple(r)
        for r in click_purchase_attribution(
            batch.filter(F.col("event_type") == "click"),
            batch.filter(F.col("event_type") == "purchase"),
        ).collect()
    )
    assert len(got) > 0
    assert got == expected
