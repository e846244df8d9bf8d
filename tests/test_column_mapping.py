"""Column mapping (rename / drop) on the snapshot table: stable column
ids make renames metadata-only while per-file stats, bloom sidecars,
prune predicates, CDC, time travel, restore and clones keep working —
the Delta column-mapping / Iceberg id-based contract. The adversarial
cases: files written BEFORE the rename carry the old physical name, so
every metadata consumer must resolve through ids, never names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.sources.snapshot_table import (
    SnapshotConflict,
    SnapshotTable,
)


def _batch(spark, lo, hi, tag="a"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("val"),
        F.lit(tag).alias("tag"),
    )


@pytest.fixture()
def renamed_table(spark, tmp_path):
    """Two file generations under the OLD name, rename, one generation
    under the NEW name — the mid-history shape every test needs."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stat_cols=["k"], bloom_cols=["k"]
    )
    t.append(_batch(spark, 0, 100, "g0"))
    t.append(_batch(spark, 100, 200, "g1"))
    t.rename_column("k", "key_id")
    t.append(
        _batch(spark, 200, 300, "g2").withColumnRenamed("k", "key_id")
    )
    return t


def test_rename_reads_all_generations(renamed_table):
    df = renamed_table.read()
    assert df.columns == ["key_id", "val", "tag"]
    rows = df.collect()
    assert len(rows) == 300
    assert {r.key_id for r in rows} == set(range(300))
    # values stay paired with their keys across the mapping
    assert all(r.val == r.key_id * 10 for r in rows)


def test_rename_stat_prune_spans_generations(renamed_table):
    t = renamed_table
    # range prune under the NEW name must skip files from BOTH
    # generations (old files' stats are keyed by the old name)
    live = t._live_files()
    pruned = t._apply_prunes(
        live, [("key_id", 50, 60)], None, t.latest_version()
    )
    assert 0 < len(pruned) < len(live)
    df = t.read(prune=[("key_id", 50, 60)])
    got = sorted(
        r.key_id for r in df.filter(F.col("key_id").between(50, 60))
        .collect()
    )
    assert got == list(range(50, 61))


def test_rename_bloom_prune_spans_generations(renamed_table):
    t = renamed_table
    live = t._live_files()
    kept = t._bloom_keep_files(
        live, [("key_id", [7])], t.latest_version()
    )
    # sidecars written under the old name still prove absence
    assert 0 < len(kept) < len(live)
    df = t.read(bloom=[("key_id", [7])])
    assert [
        r.key_id
        for r in df.filter(F.col("key_id") == 7).collect()
    ] == [7]


def test_rename_time_travel_serves_old_name(renamed_table):
    t = renamed_table
    old = t.read(version=1)  # pre-rename head
    assert old.columns == ["k", "val", "tag"]
    assert old.count() == 200
    # and the post-rename snapshot serves the new name
    assert t.read(version=2).columns == ["key_id", "val", "tag"]


def test_rename_then_merge_prunes_on_new_name(renamed_table):
    t = renamed_table
    src = t.spark.createDataFrame(
        [(5, 999, "m"), (250, 999, "m")],
        "key_id long, val long, tag string",
    )
    t.merge_into(src, ["key_id"], when_matched="update")
    stats = t.last_merge_stats
    # the point-set + bloom prune must confine the candidate scan even
    # though one key lives in a pre-rename file
    assert stats["candidates"] < stats["live"]
    rows = {
        r.key_id: r.val
        for r in t.read().filter(
            F.col("key_id").isin(5, 250, 6)
        ).collect()
    }
    assert rows == {5: 999, 250: 999, 6: 60}


def test_changes_across_rename_use_end_names(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["k"])
    t.append(_batch(spark, 0, 50))
    t.delete_where("k < 5")  # v1: DML before the rename
    t.rename_column("val", "amount")  # v2
    t.update_where("k = 10", {"amount": "amount + 1"})  # v3
    net = t.changes(0, t.latest_version(), ["k"])
    assert "amount" in net.columns and "val" not in net.columns
    by_type = {
        (r.k, r._change_type): r for r in net.collect()
    }
    assert (10, "update_postimage") in by_type
    assert by_type[(10, "update_postimage")].amount == 101
    assert sum(1 for (k, c) in by_type if c == "delete") == 5


def test_change_feed_across_rename_with_capture(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stat_cols=["k"], cdf=True
    )
    t.append(_batch(spark, 0, 20))
    t.delete_where("k = 3")  # v1 captured
    t.rename_column("val", "amount")  # v2 metadata-only
    t.delete_where("k = 7")  # v3 captured under the new name
    feed = t.change_feed(0, t.latest_version(), ["k"])
    assert "amount" in feed.columns and "val" not in feed.columns
    rows = feed.collect()
    deletes = {(r.k, r._commit_version) for r in rows
               if r._change_type == "delete"}
    assert deletes == {(3, 1), (7, 3)}
    # pre-rename captured rows serve their values under the new name
    amt = {r.k: r.amount for r in rows if r._change_type == "delete"}
    assert amt == {3: 30, 7: 70}


def test_drop_column_then_readd_does_not_resurrect(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_batch(spark, 0, 10))
    t.drop_column("val")
    assert t.read().columns == ["k", "tag"]
    # re-adding the same NAME is a NEW column (fresh id): old bytes
    # stay invisible, old rows read null
    t.append(
        spark.range(10, 15).select(
            F.col("id").alias("k"),
            F.lit("b").alias("tag"),
            (F.col("id") + 1000).alias("val"),
        )
    )
    rows = {r.k: r.val for r in t.read().collect()}
    assert rows[0] is None and rows[9] is None
    assert rows[12] == 1012
    # time travel before the drop still serves the original values
    assert {r.val for r in t.read(version=0).collect()} == {
        i * 10 for i in range(10)
    }


def test_restore_across_rename(renamed_table):
    t = renamed_table
    t.restore(1)  # back to the pre-rename snapshot
    df = t.read()
    assert df.columns == ["k", "val", "tag"]
    assert df.count() == 200
    assert {r.k for r in df.collect()} == set(range(200))
    # and forward again: the rename history is still travelable
    assert t.read(version=2).columns == ["key_id", "val", "tag"]


def test_clone_after_rename(renamed_table, tmp_path):
    t = renamed_table
    c = t.clone_to(str(tmp_path / "c"))
    df = c.read()
    assert df.columns == ["key_id", "val", "tag"]
    assert df.count() == 300
    assert {r.key_id for r in df.collect()} == set(range(300))
    # the clone prunes through the inherited mapping too
    pruned = c.read(prune=[("key_id", 10, 20)])
    got = sorted(
        r.key_id
        for r in pruned.filter(
            F.col("key_id").between(10, 20)
        ).collect()
    )
    assert got == list(range(10, 21))


def test_publish_clone_after_source_rename(renamed_table, tmp_path):
    t = renamed_table
    c = t.clone_to(str(tmp_path / "c"))
    c.delete_where("key_id >= 290")
    t.publish_from(c)
    df = t.read()
    assert df.columns == ["key_id", "val", "tag"]
    assert df.count() == 290


def test_rename_refused_when_constraint_references(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_batch(spark, 0, 10))
    t.add_constraint("pos", "val >= 0")
    with pytest.raises(ValueError, match="constraint"):
        t.rename_column("val", "amount")
    t.drop_constraint("pos")
    t.rename_column("val", "amount")
    assert t.read().columns == ["k", "amount", "tag"]


def test_rename_conflicts_with_concurrent_commit(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_batch(spark, 0, 10))
    head = t.latest_version()
    guard = t._fixed_head_guard(head)
    t.append(_batch(spark, 10, 20))  # the head moves
    with pytest.raises(SnapshotConflict):
        guard(t._live_files())


def test_schema_evolution_after_rename_gets_fresh_id(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(_batch(spark, 0, 10))
    t.rename_column("tag", "label")
    t.append(
        spark.range(10, 12).select(
            F.col("id").alias("k"),
            (F.col("id") * 10).alias("val"),
            F.lit("new").alias("label"),
            F.lit(1.5).alias("score"),
        )
    )
    cm = t._colmap_at(t.latest_version())
    assert set(cm) == {"k", "val", "label", "score"}
    assert len(set(cm.values())) == 4  # ids unique, none reused
    rows = {r.k: (r.label, r.score) for r in t.read().collect()}
    assert rows[0] == ("a", None)
    assert rows[11] == ("new", 1.5)


def test_unmapped_table_plan_untouched(spark, tmp_path):
    """A table that never renamed must take the identity fast path:
    no colmap property, no per-group union in the read plan."""
    t = SnapshotTable(spark, str(tmp_path / "t"), stat_cols=["k"])
    t.append(_batch(spark, 0, 10))
    t.append(_batch(spark, 10, 20))
    assert t._colmap_at(t.latest_version()) is None
    assert t._mapping_groups(t._live_files(), None) is None
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


# ---------------- the Spark FORMAT on mapped tables ----------------


def _load_fmt(spark, path, **opts):
    from data_engineering_pipeline_spark.sources import (
        spark_datasource as sds,
    )

    sds.register(spark)
    r = spark.read.format(sds.FORMAT_NAME).option("path", path)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_format_batch_read_across_rename(renamed_table):
    t = renamed_table
    df = _load_fmt(t.spark, t.path)
    assert df.columns == ["key_id", "val", "tag"]
    rows = df.collect()
    assert {r.key_id for r in rows} == set(range(300))
    assert all(r.val == r.key_id * 10 for r in rows)
    # time travel through the format serves the old name
    old = _load_fmt(t.spark, t.path, version=1)
    assert old.columns == ["k", "val", "tag"]
    assert old.count() == 200


def test_format_pushdown_prunes_across_rename(renamed_table):
    from pyspark.sql.datasource import EqualTo

    from data_engineering_pipeline_spark.sources import (
        spark_datasource as sds,
    )

    t = renamed_table
    r = sds.SnapshotReader({"path": t.path})
    total = len(r.partitions())
    r.pushFilters([EqualTo(("key_id",), 7)])
    kept = len(r.partitions())
    # key 7 lives in a PRE-rename file whose stats are keyed "k" —
    # the translated pushdown must still prune
    assert 0 < kept < total
    df = _load_fmt(t.spark, t.path).filter(F.col("key_id") == 7)
    assert [(x.key_id, x.val) for x in df.collect()] == [(7, 70)]


def test_format_change_feed_across_rename(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stat_cols=["k"], cdf=True
    )
    t.append(_batch(spark, 0, 20))
    t.delete_where("k = 3")  # v1 captured under old names
    t.rename_column("val", "amount")  # v2
    t.delete_where("k = 7")  # v3 captured under new names
    feed = _load_fmt(spark, t.path, readChangeFeed="true")
    assert "amount" in feed.columns and "val" not in feed.columns
    rows = feed.filter(F.col("_change_type") == "delete").collect()
    assert {(r.k, r._commit_version, r.amount) for r in rows} == {
        (3, 1, 30), (7, 3, 70)
    }


def test_format_change_feed_range_ending_before_rename(spark, tmp_path):
    """r9 review: a feed read whose endingVersion PRECEDES a later
    rename must serve the ending version's column names — the declared
    schema previously resolved HEAD names while the reader emitted
    end-version names, and the Arrow read failed on any pre-rename
    range. The same range read after the rename is the time-travel
    shape an auditor runs ("what changed before the schema change")."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stat_cols=["k"], cdf=True
    )
    t.append(_batch(spark, 0, 20))
    t.delete_where("k = 3")  # v1 captured under old names
    v_pre = t.latest_version()
    t.rename_column("val", "amount")  # v2
    feed = _load_fmt(
        spark, t.path, readChangeFeed="true",
        endingVersion=str(v_pre),
    )
    assert "val" in feed.columns and "amount" not in feed.columns
    rows = feed.collect()
    assert {(r.k, r._change_type, r._commit_version) for r in rows
            if r.k == 3} == {(3, "insert", 0), (3, "delete", 1)}
    # the head-default range still serves head names
    head_feed = _load_fmt(spark, t.path, readChangeFeed="true")
    assert "amount" in head_feed.columns


def test_rename_survives_retention_expiry(spark, tmp_path):
    """Retention can expire the manifests that carried the colmap at a
    file's adding version; checkpoints written while the log was
    intact materialize each entry's write-time mapping explicitly, so
    post-expiry reads still resolve pre/post-rename files correctly."""
    t = SnapshotTable(
        spark, str(tmp_path / "t"), stat_cols=["k"], checkpoint_every=4
    )
    t.append(_batch(spark, 0, 20, "g0"))        # v0 (old names)
    t.rename_column("val", "amount")            # v1
    for i in range(6):                          # v2..v7 (new names)
        t.append(
            _batch(spark, 20 + i * 10, 30 + i * 10, "g")
            .withColumnRenamed("val", "amount")
        )
    t.expire_versions(keep_last=2, grace_seconds=0.0)
    # the rename commit (v1) and several post-rename adds are expired;
    # a FRESH handle (no pre-expiry memos — the restart scenario) must
    # still serve every surviving file's columns correctly
    t2 = SnapshotTable(spark, t.path)
    rows = {r.k: r.amount for r in t2.read().collect()}
    assert len(rows) == 80
    assert all(rows[k] == k * 10 for k in rows)
    # pruning still translates through checkpoint-carried cmaps
    live = t2._live_files()
    pruned = t2._apply_prunes(
        live, [("k", 5, 7)], None, t2.latest_version()
    )
    assert 0 < len(pruned) < len(live)


def test_compact_after_rename_washes_out_mapping(renamed_table):
    """Compaction reads under current names and rewrites — the new
    files' physical names ARE the current names, so the mapped-read
    union disappears from the plan after compact."""
    t = renamed_table
    t.compact(target_files=2)
    df = t.read()
    assert df.columns == ["key_id", "val", "tag"]
    rows = df.collect()
    assert len(rows) == 300
    assert all(r.val == r.key_id * 10 for r in rows)
    # single file generation now: identity mapping -> fast path
    assert t._mapping_groups(t._live_files(), None) is None


def test_stale_handle_cannot_clobber_renamed_metadata(spark, tmp_path):
    """A handle constructed BEFORE a rename still advertises the old
    stat/bloom column names; its next write must neither compute stats
    under the dead name nor stamp the stale list over the renamed
    property."""
    path = str(tmp_path / "t")
    stale = SnapshotTable(spark, path, stat_cols=["k"], bloom_cols=["k"])
    stale.append(_batch(spark, 0, 50))
    fresh = SnapshotTable(spark, path)
    fresh.rename_column("k", "key_id")
    # the stale handle writes; the guard substitutes the persisted
    # (renamed) metadata columns
    stale.append(
        _batch(spark, 50, 100).withColumnRenamed("k", "key_id")
    )
    props = fresh.properties_at()
    assert props["stat_cols"] == "key_id"
    assert props["bloom_cols"] == "key_id"
    # the new generation's files carry stats under the NEW name, so
    # pruning still works across both generations
    t = SnapshotTable(spark, path)
    live = t._live_files()
    pruned = t._apply_prunes(
        live, [("key_id", 60, 70)], None, t.latest_version()
    )
    assert 0 < len(pruned) < len(live)
    rows = {r.key_id for r in t.read().collect()}
    assert rows == set(range(100))


def test_write_racing_rename_conflicts(spark, tmp_path):
    """A writer that read its schema under one mapping must not commit
    under another: re-merging its pre-rename staged columns against
    the renamed head would resurrect the old name as a brand-new
    column (forked schema). The colmap guard conflicts instead."""
    path = str(tmp_path / "t")
    t = SnapshotTable(spark, path, stat_cols=["k"])
    t.append(_batch(spark, 0, 20))
    t.rename_column("k", "key_id")  # table is now mapped

    writer = SnapshotTable(spark, path)
    head = writer.latest_version()
    cm_basis = writer._colmap_token(head)
    # another handle renames while the writer's transaction is open
    SnapshotTable(spark, path).rename_column("val", "amount")
    with pytest.raises(SnapshotConflict, match="column mapping"):
        writer._commit_loop(
            "merge", [], lambda live: [],
            schema=writer._schema_at(head), colmap_basis=cm_basis,
        )
    # the schema did not fork: still exactly three columns
    assert SnapshotTable(spark, path).read().columns == [
        "key_id", "amount", "tag"
    ]


def test_bloom_probe_after_type_widening(spark, tmp_path):
    """Bloom sidecars hash with the write-time physical type; after an
    int column widens to long, probes must hash old sidecars with INT
    (xxhash64 differs across widths) — a wrong-type probe would
    false-negative and prune files that DO hold the value."""
    t = SnapshotTable(spark, str(tmp_path / "t"), bloom_cols=["k"])
    t.append(
        spark.range(0, 50).select(
            F.col("id").cast("int").alias("k"),
            F.lit("old").alias("tag"),
        ).repartition(4)
    )
    # widen k to long with a second generation
    t.append(
        spark.range(50, 60).select(
            F.col("id").alias("k"), F.lit("new").alias("tag")
        )
    )
    assert dict(t.read().dtypes)["k"] == "bigint"
    live = t._live_files()
    # value 7 lives in an INT-typed old file: the typed probe must
    # keep that file (false negative = silent row loss)
    kept = t._bloom_keep_files(live, [("k", [7])], t.latest_version())
    rows = [r.k for r in t.read(bloom=[("k", [7])])
            .filter(F.col("k") == 7).collect()]
    assert rows == [7]
    # and the prune still prunes: files provably without 7 drop
    assert 0 < len(kept) < len(live)
    # a value unrepresentable in int32 can only be in the long files
    big = 3_000_000_000
    t.merge_into(
        spark.createDataFrame([(big, "big")], "k long, tag string"),
        ["k"],
    )
    kept_big = t._bloom_keep_files(
        t._live_files(), [("k", [big])], t.latest_version()
    )
    got = [r.k for r in t.read(bloom=[("k", [big])])
           .filter(F.col("k") == big).collect()]
    assert got == [big]
    assert len(kept_big) < len(t._live_files())


def test_stream_source_raises_on_mid_stream_rename(spark, tmp_path):
    """The streaming source pins its schema at the first batch; a
    rename inside a later batch range must stop the stream with a
    restart error, not silently null-fill the renamed column."""
    from data_engineering_pipeline_spark.sources import (
        spark_datasource as sds,
    )

    t = SnapshotTable(spark, str(tmp_path / "t"), cdf=True)
    t.append(_batch(spark, 0, 10))  # v0
    t.rename_column("val", "amount")  # v1
    t.append(
        _batch(spark, 10, 20).withColumnRenamed("val", "amount")
    )  # v2
    r = sds.SnapshotStreamReader({"path": t.path})
    with pytest.raises(ValueError, match="restart the streaming"):
        r.partitions({"version": -1}, {"version": 2})
    rc = sds.SnapshotStreamReader(
        {"path": t.path, "readchangefeed": "true"}
    )
    with pytest.raises(ValueError, match="restart the streaming"):
        rc.partitions({"version": -1}, {"version": 2})
    # ranges that don't cross the rename still stream fine
    parts = sds.SnapshotStreamReader({"path": t.path}).partitions(
        {"version": 1}, {"version": 2}
    )
    assert len(parts) >= 1


@pytest.mark.slow  # heavy e2e/property: close-out tier (pytest.ini)
def test_big_batch_bloom_prune_across_rename(spark, tmp_path):
    """r11: the big-batch bloom point collection (merge sources beyond
    the 1024-key stat cap) composes with column mapping — sidecars
    written under the OLD physical name must still prune a big merge
    probing under the NEW name, and the merge result must equal an
    un-indexed twin's."""
    data = spark.range(0, 4000).select(
        F.col("id").alias("k"), F.lit("v0").alias("tag")
    ).repartition(8)
    t_b = SnapshotTable(spark, str(tmp_path / "rb"),
                        stat_cols=["k"], bloom_cols=["k"])
    t_p = SnapshotTable(spark, str(tmp_path / "rp"), stat_cols=["k"])
    t_b.append(data)
    t_p.append(data)
    t_b.rename_column("k", "key_id")
    t_p.rename_column("k", "key_id")
    src = spark.createDataFrame(
        [(100_000 + i, "new") for i in range(3000)] + [(7, "upd")],
        "key_id long, tag string",
    )
    for t in (t_b, t_p):
        t.merge_into(src, ["key_id"], when_matched="update", mode="mor")
    # r12: the big-batch STAT point collection fires across the rename
    # too (stats resolve the old physical name), so the stats-only twin
    # may prune files whose [min,max] holds none of the batch's keys —
    # blooms must still be at least as tight, and never tighter than
    # correct (the result-parity check below)
    assert (
        t_b.last_merge_stats["candidates"]
        <= t_p.last_merge_stats["candidates"]
    )
    assert t_b.last_merge_stats["candidates"] <= 4  # blooms resolve old name
    rows_b = sorted((r.key_id, r.tag) for r in t_b.read().collect())
    rows_p = sorted((r.key_id, r.tag) for r in t_p.read().collect())
    assert rows_b == rows_p and len(rows_b) == 7000
    assert dict(rows_b)[7] == "upd"
