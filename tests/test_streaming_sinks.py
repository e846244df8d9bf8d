"""Streaming sink semantics: foreachBatch upsert converges (replays
don't duplicate) and watermarked dropDuplicates removes duplicate keys
within the horizon."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.streaming.events import read_events_stream
from data_engineering_pipeline_spark.streaming.sinks import (
    dedup_stream,
    upsert_sink,
)


def _events_input(tmp_path, sf_smoke, name="in1"):
    d = tmp_path / name
    d.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet", d / "a.parquet")
    return str(d)


def test_upsert_sink_idempotent_across_restarts(spark, tmp_path, sf_smoke):
    src = _events_input(tmp_path, sf_smoke)
    out = str(tmp_path / "out")
    ck1 = str(tmp_path / "ck1")
    ck2 = str(tmp_path / "ck2")

    stream = read_events_stream(spark, src)
    upsert_sink(stream, out, ["event_id"], "ts", ck1).awaitTermination()
    n1 = spark.read.parquet(out).count()

    # replay the SAME data with a fresh checkpoint (simulates an
    # at-least-once source replaying everything): merged state unchanged
    stream2 = read_events_stream(spark, src)
    upsert_sink(stream2, out, ["event_id"], "ts", ck2).awaitTermination()
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0


def test_dedup_stream_drops_same_key(spark, tmp_path, sf_smoke):
    # duplicate the entire input file -> every (event_id, ts) twice
    d = tmp_path / "in2"
    d.mkdir()
    shutil.copy(f"{sf_smoke}/events.parquet", d / "a.parquet")
    shutil.copy(f"{sf_smoke}/events.parquet", d / "b.parquet")

    deduped = dedup_stream(
        read_events_stream(spark, str(d)), keys=["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) c, count(DISTINCT event_id) d FROM dedup_out").collect()[0]
    expected = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    assert got.c == got.d == expected
