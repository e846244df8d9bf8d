"""Python DataSource integration for the snapshot table: batch reads
(time travel, catalyst filter pushdown pruning files via manifest
stats, DV masking on executors, schema evolution), and the streaming
source (log tailing, checkpoint resume, change-commit contract)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from data_engineering_pipeline_spark.sources import spark_datasource as sds
from data_engineering_pipeline_spark.sources.snapshot_table import (
    SnapshotTable,
)


def _kv(spark, lo, hi, tag="x"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def _load(spark, path, **opts):
    sds.register(spark)
    r = spark.read.format(sds.FORMAT_NAME).option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_handle_including_dvs(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_kv(spark, 0, 50, "a").repartition(3))
    t.delete_where("k % 7 = 0", mode="mor")  # DV mask must apply
    df = _load(spark, t.path)
    assert df.schema == t.read().schema
    assert sorted(r.k for r in df.collect()) == sorted(
        r.k for r in t.read().collect()
    )
    # time travel via both options
    assert _load(spark, t.path, version=0).count() == 50
    stamp = t.history()[0]["ts"]
    assert _load(spark, t.path, timestamp=str(stamp)).count() == 50


def test_filter_pushdown_prunes_files_and_stays_correct(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "p"), stat_cols=["k"])
    # range-clustered files -> tight [min,max] per file
    t.append(_kv(spark, 0, 400).repartitionByRange(4, "k"))
    r = sds.SnapshotReader({"path": t.path})
    assert len(r.partitions()) == 4
    kept = r.pushFilters([EqualTo(("k",), 123)])
    assert list(kept) == [EqualTo(("k",), 123)]  # Spark re-applies
    assert len(r.partitions()) == 1
    r2 = sds.SnapshotReader({"path": t.path})
    r2.pushFilters([GreaterThan(("k",), 299)])
    assert len(r2.partitions()) == 1
    r3 = sds.SnapshotReader({"path": t.path})
    r3.pushFilters([In(("k",), (5, 350))])
    assert len(r3.partitions()) == 2
    # end to end through catalyst: correct rows, not just fewer files
    df = _load(spark, t.path).filter("k = 123 OR k = 350")
    assert sorted(r.k for r in df.collect()) == [123, 350]


def test_schema_evolution_and_clone_locs(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "e"))
    t.append(_kv(spark, 0, 5, "a"))
    t.append(
        _kv(spark, 5, 8, "b").withColumn("extra", F.col("id") * 10)
        if "id" in _kv(spark, 5, 8).columns
        else _kv(spark, 5, 8, "b").withColumn("extra", F.col("k") * 10)
    )
    df = _load(spark, t.path)
    rows = {r.k: r.extra for r in df.collect()}
    assert rows[2] is None and rows[6] == 60  # old files read null
    # a shallow clone's inherited absolute locs resolve on executors
    clone = t.clone_to(str(tmp_path / "e2"))
    assert _load(spark, clone.path).count() == 8


def test_streaming_tail_resume_and_change_contract(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "s"))
    t.append(_kv(spark, 0, 10, "a"))
    t.append(_kv(spark, 10, 15, "b"))
    sds.register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            spark.readStream.format(sds.FORMAT_NAME)
            .option("path", t.path).load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 15
    # resume from the streaming checkpoint: only the new commit
    t.append(_kv(spark, 15, 18, "c"))
    run_once()
    assert spark.read.parquet(out).count() == 18
    # a rewrite commit breaks the append contract -> stream errors
    t.delete_where("k < 2")
    with pytest.raises(Exception, match="skipChangeCommits"):
        run_once()
    # ... unless told to skip change commits wholesale
    out2, ckpt2 = str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    q = (
        spark.readStream.format(sds.FORMAT_NAME)
        .option("path", t.path)
        .option("skipChangeCommits", "true").load()
        .writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.read.parquet(out2).count() == 18  # adds-only replay


def test_streaming_starting_version_latest(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "sl"))
    t.append(_kv(spark, 0, 100, "old"))
    sds.register(spark)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")
    # nothing yet: startingVersion=latest skips retained history
    t.append(_kv(spark, 100, 103, "new"))
    q = (
        spark.readStream.format(sds.FORMAT_NAME)
        .option("path", t.path)
        .option("startingVersion", "1").load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [
        100, 101, 102
    ]


def test_format_write_create_append_overwrite_interop(spark, tmp_path):
    sds.register(spark)
    p = str(tmp_path / "w")
    df = _kv(spark, 0, 50, "a")
    df.write.format(sds.FORMAT_NAME).option("path", p).mode(
        "append"
    ).save()  # creates the table
    t = SnapshotTable(spark, p)
    assert t.read().count() == 50 and t.latest_version() == 0
    df.write.format(sds.FORMAT_NAME).option("path", p).mode(
        "append"
    ).save()
    assert t.read().count() == 100
    _kv(spark, 0, 7, "b").write.format(sds.FORMAT_NAME).option(
        "path", p
    ).mode("overwrite").save()
    assert t.read().count() == 7
    assert t.history()[-1]["op"] == "overwrite"
    # full interop: the handle's DML works on format-written files
    t.merge_into(
        spark.createDataFrame([(3, "z"), (100, "new")],
                              "k long, tag string"),
        ["k"],
    )
    rows = {r.k: r.tag for r in t.read().collect()}
    assert rows[3] == "z" and rows[100] == "new" and len(rows) == 8


def test_format_write_keeps_stats_for_pruning(spark, tmp_path):
    p = str(tmp_path / "ws")
    # a stat-aware handle creates the table, stamping the property
    t = SnapshotTable(spark, p, stat_cols=["k"])
    t.append(_kv(spark, 0, 10, "seed"))
    sds.register(spark)
    _kv(spark, 1000, 1100, "fmt").repartitionByRange(
        2, "k"
    ).write.format(sds.FORMAT_NAME).option("path", p).mode(
        "append"
    ).save()
    # the format writer derived footer stats -> prune still bites
    probe = t.read(prune=[("k", 1000, 1010)])
    assert len(probe.inputFiles()) < 3
    assert probe.filter("k between 1000 and 1010").count() == 11


def test_format_write_refuses_constraints_and_generated(spark, tmp_path):
    p = str(tmp_path / "wc")
    t = SnapshotTable(spark, p)
    t.append(_kv(spark, 0, 5, "a"))
    t.add_constraint("k_nonneg", "k >= 0")
    sds.register(spark)
    with pytest.raises(Exception, match="constraint"):
        _kv(spark, 5, 9, "b").write.format(sds.FORMAT_NAME).option(
            "path", p
        ).mode("append").save()


def test_format_writer_abort_drops_staged(spark, tmp_path):
    import pyarrow as pa

    p = str(tmp_path / "wa")
    SnapshotTable(spark, p).append(_kv(spark, 0, 3, "a"))
    w = sds.SnapshotWriter({"path": p}, _kv(spark, 0, 1).schema, False)
    msg = w.write(iter([pa.record_batch({"k": [1], "tag": ["x"]})]))
    staged = os.path.join(p, "data", msg.name)
    assert os.path.exists(staged)
    w.abort([msg])
    assert not os.path.exists(staged)
    assert SnapshotTable(spark, p).read().count() == 3  # untouched


def test_stream_write_exactly_once_txn(spark, tmp_path):
    import pyarrow as pa

    p = str(tmp_path / "wt")
    schema = _kv(spark, 0, 1).schema
    w = sds.SnapshotStreamWriter({"path": p, "txnappid": "q1"}, schema)
    msg = w.write(iter([pa.record_batch({"k": [1], "tag": ["x"]})]))
    w.commit([msg], batchId=0)
    t = SnapshotTable(spark, p)
    assert t.read().count() == 1 and t.txn_version("q1") == 0
    # a REPLAYED epoch (same batchId) stages again but commits nothing
    msg2 = w.write(iter([pa.record_batch({"k": [1], "tag": ["x"]})]))
    w.commit([msg2], batchId=0)
    assert t.read().count() == 1 and t.latest_version() == 0
    # the next epoch lands normally
    msg3 = w.write(iter([pa.record_batch({"k": [2], "tag": ["y"]})]))
    w.commit([msg3], batchId=1)
    assert t.read().count() == 2 and t.txn_version("q1") == 1


def test_stream_write_end_to_end(spark, tmp_path):
    sds.register(spark)
    src = str(tmp_path / "src")
    _kv(spark, 0, 5, "s").write.mode("append").parquet(src)
    p = str(tmp_path / "wse")
    q = (
        spark.readStream.schema("k long, tag string").parquet(src)
        .writeStream.format(sds.FORMAT_NAME)
        .option("path", p).option("txnAppId", "e2e")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    t = SnapshotTable(spark, p)
    assert sorted(r.k for r in t.read().collect()) == [0, 1, 2, 3, 4]


def test_batch_read_change_feed_on_cdf_table(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "rcf"), cdf=True)
    t.append(_kv(spark, 0, 6, "a"))
    t.merge_into(
        spark.createDataFrame([(2, "upd"), (99, "new")],
                              "k long, tag string"),
        ["k"],
    )
    t.delete_where("k = 0", mode="mor")
    sds.register(spark)
    feed = (
        spark.read.format(sds.FORMAT_NAME)
        .option("path", t.path)
        .option("readChangeFeed", "true").load()
    )
    rows = {(r.k, r._change_type, r._commit_version)
            for r in feed.collect()}
    # v0's append synthesizes as inserts; the v1 merge and v2 delete
    # are served from their captured cdc files
    assert (3, "insert", 0) in rows
    assert (2, "update_preimage", 1) in rows
    assert (2, "update_postimage", 1) in rows
    assert (99, "insert", 1) in rows
    assert (0, "delete", 2) in rows
    # bounded range: only the merge commit
    only_merge = (
        spark.read.format(sds.FORMAT_NAME)
        .option("path", t.path).option("readChangeFeed", "true")
        .option("startingVersion", "1")
        .option("endingVersion", "1").load()
    )
    assert {r._commit_version for r in only_merge.collect()} == {1}
    # matches the engine-side feed row-for-row (post-v0 range)
    engine = t.change_feed(0, 2, ["k"])
    fmt = (
        spark.read.format(sds.FORMAT_NAME)
        .option("path", t.path).option("readChangeFeed", "true")
        .option("startingVersion", "1").load()
    )
    assert sorted(
        (r.k, r.tag, r._change_type, r._commit_version)
        for r in fmt.collect()
    ) == sorted(
        (r.k, r.tag, r._change_type, r._commit_version)
        for r in engine.collect()
    )


def test_stream_change_feed_and_uncaptured_guard(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "scf"), cdf=True)
    t.append(_kv(spark, 0, 4, "a"))
    t.update_where("k = 1", {"tag": "'u'"})
    sds.register(spark)
    out, ckpt = str(tmp_path / "o"), str(tmp_path / "c")

    def run_once():
        q = (
            spark.readStream.format(sds.FORMAT_NAME)
            .option("path", t.path)
            .option("readChangeFeed", "true").load()
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    got = {(r.k, r._change_type, r._commit_version)
           for r in spark.read.parquet(out).collect()}
    assert (1, "update_preimage", 1) in got
    assert (1, "update_postimage", 1) in got
    assert (0, "insert", 0) in got
    # incremental resume streams only the next commit's transitions
    t.delete_where("k = 2")
    run_once()
    got2 = {(r.k, r._change_type, r._commit_version)
            for r in spark.read.parquet(out).collect()}
    assert (2, "delete", 2) in got2 and len(got2) == len(got) + 1
    # an UNCAPTURED change commit (pre-CDF table) raises with advice
    p = SnapshotTable(spark, str(tmp_path / "plainrcf"))  # no cdf
    p.append(_kv(spark, 0, 3, "x"))
    p.delete_where("k = 0")
    with pytest.raises(Exception, match="cdf=True|skipChangeCommits"):
        (spark.read.format(sds.FORMAT_NAME)
         .option("path", p.path)
         .option("readChangeFeed", "true").load().collect())
