"""applyInPandasWithState: running per-user totals accumulate across
micro-batches and match the batch ground truth after draining."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.sources import load_table
from data_engineering_pipeline_spark.streaming.events import read_events_stream
from data_engineering_pipeline_spark.streaming.stateful import running_user_totals


def test_running_totals_match_batch(spark, tmp_path, sf_smoke):
    # 8 copies with maxFilesPerTrigger=4 -> 2 micro-batches, so the
    # accumulator genuinely carries state across triggers.
    src = tmp_path / "in"
    src.mkdir()
    for i in range(8):
        shutil.copy(f"{sf_smoke}/events.parquet", src / f"copy{i}.parquet")

    stream = running_user_totals(read_events_stream(spark, str(src)))
    q = (
        stream.writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # last emitted row per user == batch totals
    got = {
        r.user_id: (r.n_events, r.value_sum)
        for r in spark.sql(
            """SELECT user_id, n_events, value_sum FROM (
                 SELECT *, row_number() OVER (
                   PARTITION BY user_id ORDER BY n_events DESC) rn
                 FROM running_totals) WHERE rn = 1"""
        ).collect()
    }
    expected = {
        r.user_id: (8 * r.n, round(8 * r.s, 2))
        for r in load_table(spark, sf_smoke, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(expected)
    for uid, (n, s) in expected.items():
        gn, gs = got[uid]
        assert gn == n, uid
        assert abs(gs - s) < 1e-4, uid

    # at least one user must have been emitted in both micro-batches
    multi = spark.sql(
        "SELECT max(cnt) FROM (SELECT user_id, count(*) cnt "
        "FROM running_totals GROUP BY user_id)"
    ).collect()[0][0]
    assert multi >= 2
