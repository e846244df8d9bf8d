"""Transactional snapshot table: atomic commits, optimistic
concurrency, time travel, crash invisibility, vacuum, stat pruning.
The multi-writer capability the plain upsert module scopes out
(single-writer, like the reference database.py:60-71)."""

from __future__ import annotations

import os
import threading

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.sources.snapshot_table import (
    SnapshotConflict,
    SnapshotTable,
)


def _df(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def test_append_read_history_roundtrip(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t1"))
    v0 = t.append(_df(spark, 0, 10, "a"))
    v1 = t.append(_df(spark, 10, 15, "b"))
    assert (v0, v1) == (0, 1)
    assert t.read().count() == 15
    h = t.history()
    assert [e["version"] for e in h] == [0, 1]
    assert [e["rows_added"] for e in h] == [10, 5]
    assert all(e["op"] == "append" for e in h)


def test_time_travel_and_overwrite_atomicity(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t2"))
    t.append(_df(spark, 0, 10, "a"))
    t.overwrite(_df(spark, 100, 103, "b"))
    # latest = overwritten contents; version 0 still fully readable
    assert sorted(r.k for r in t.read().collect()) == [100, 101, 102]
    assert t.read(version=0).count() == 10
    assert t.history()[-1]["op"] == "overwrite"
    with pytest.raises(ValueError):
        t.read(version=5)


def test_upsert_merges_last_write_wins(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t3"))
    base = spark.createDataFrame(
        [(1, 10, "old"), (2, 10, "old")], "k long, ord long, tag string"
    )
    t.append(base)
    newer = spark.createDataFrame(
        [(2, 20, "new"), (3, 20, "new")], "k long, ord long, tag string"
    )
    t.upsert(newer, ["k"], "ord")
    rows = {r.k: r.tag for r in t.read().collect()}
    assert rows == {1: "old", 2: "new", 3: "new"}
    # pre-merge snapshot intact
    assert {r.tag for r in t.read(version=0).collect()} == {"old"}


def test_concurrent_appends_all_commit(spark, tmp_path):
    """Racing writers: the O_EXCL commit gives each append a distinct
    version and no rows are lost."""
    t = SnapshotTable(spark, str(tmp_path / "t4"))
    t.append(_df(spark, 0, 1, "seed"))
    errs = []

    def worker(i):
        try:
            SnapshotTable(spark, str(tmp_path / "t4")).append(
                _df(spark, 100 * i, 100 * i + 10, f"w{i}")
            )
        except Exception as exc:  # noqa: BLE001
            errs.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(1, 5)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert t.latest_version() == 4
    assert t.read().count() == 1 + 4 * 10


def test_upsert_conflicts_with_concurrent_overwrite(spark, tmp_path):
    """Read-modify-write loses the race: a concurrent overwrite removes
    the files the upsert read -> SnapshotConflict, never a silent lost
    update."""
    path = str(tmp_path / "t5")
    t = SnapshotTable(spark, path)
    t.append(
        spark.createDataFrame([(1, 1, "a")], "k long, ord long, tag string")
    )

    orig_stage = t._stage
    fired = {}

    def hooked(df):
        staged = orig_stage(df)
        if not fired:
            fired["x"] = True
            SnapshotTable(spark, path).overwrite(
                spark.createDataFrame(
                    [(9, 9, "other")], "k long, ord long, tag string"
                )
            )
        return staged

    t._stage = hooked
    with pytest.raises(SnapshotConflict):
        t.upsert(
            spark.createDataFrame(
                [(1, 2, "upd")], "k long, ord long, tag string"
            ),
            ["k"],
            "ord",
        )
    # the winning overwrite is the head; no partial merge is visible
    assert [r.tag for r in t.read().collect()] == ["other"]


def test_uncommitted_files_invisible_and_vacuumed(spark, tmp_path):
    """Crash-before-commit leaves only unreferenced data files: reads
    never see them; vacuum deletes them; files removed by overwrite
    SURVIVE vacuum because time travel still needs them."""
    t = SnapshotTable(spark, str(tmp_path / "t6"))
    t.append(_df(spark, 0, 5, "a"))
    t.overwrite(_df(spark, 10, 12, "b"))
    # simulate a writer that died before commit: stage without manifest
    t._stage(_df(spark, 900, 950, "ghost"))
    assert t.read().count() == 2          # ghost rows invisible
    dropped = t.vacuum()
    assert dropped and all(d.endswith(".parquet") for d in dropped)
    assert t.read(version=0).count() == 5  # time travel intact
    assert t.read().count() == 2
    assert t.vacuum() == []                # idempotent


def test_compact_preserves_contents_and_shrinks_files(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t7"))
    for i in range(4):
        t.append(_df(spark, 10 * i, 10 * i + 10, f"b{i}"))
    before = set(t.read().inputFiles())
    assert len(before) > 1
    t.compact(target_files=1)
    after = t.read()
    assert len(set(after.inputFiles())) == 1
    assert after.count() == 40
    assert t.history()[-1]["op"] == "compact"


def test_stat_pruning_skips_files(spark, tmp_path):
    """Manifest min/max pruning must hand Spark strictly fewer files
    when ranges are disjoint — file-level skipping before the scan is
    even planned (inputFiles() is the witness)."""
    t = SnapshotTable(spark, str(tmp_path / "t8"), stat_cols=["k"])
    t.append(_df(spark, 0, 100, "lo").coalesce(1))
    t.append(_df(spark, 1000, 1100, "hi").coalesce(1))
    full = t.read()
    lo = t.read(prune=[("k", 0, 50)])
    assert len(lo.inputFiles()) < len(full.inputFiles())
    assert sorted(r.k for r in lo.collect()) == list(range(100))
    # fully pruned -> empty frame, schema preserved
    none = t.read(prune=[("k", 5000, 6000)])
    assert none.count() == 0
    assert none.columns == full.columns
