"""Persistent IVF index on the snapshot table: build/search recall,
probe-time file skipping, exactly-once incremental adds, health
stats."""

from __future__ import annotations

import pytest

import math
import random

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.ann_index import (
    ann_index_add,
    ann_index_search,
    build_ann_index,
    index_stats,
    load_centroids,
)
from data_engineering_pipeline_spark.operators.similarity import (
    ann_topk_brute,
)


def _clustered_vecs(n, dim=16, n_clusters=8, seed=3):
    """Gaussian blobs — the distribution IVF is for."""
    rnd = random.Random(seed)
    centers = [
        [rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_clusters)
    ]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        v = [x + rnd.gauss(0, 0.15) for x in c]
        nrm = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / nrm for x in v]))
    return rows


@pytest.mark.slow  # heavy e2e/property: close-out tier (pytest.ini)
def test_build_search_recall_and_pruning(spark, tmp_path):
    rows = _clustered_vecs(1200)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "idx")
    t = build_ann_index(spark, df, path, n_cells=8)
    assert len(load_centroids(path)) == 8

    queries = df.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_index_search(spark, queries, path, k=5, n_probe=2)
    # probe read is file-pruned: fewer files than the full table
    all_files = t.read().inputFiles()
    assert len(all_files) > 1

    # recall vs brute force on blob data with 2/8 probes
    brute = ann_topk_brute(
        queries, df.select(F.col("vec_id").alias("corpus_id"), "embedding"),
        k=5,
    )
    want = {(r.query_id, r.corpus_id) for r in brute.collect()}
    have = {(r.query_id, r.corpus_id) for r in got.collect()}
    recall = len(want & have) / len(want)
    assert recall >= 0.9, recall


def test_incremental_add_exactly_once_and_served(spark, tmp_path):
    rows = _clustered_vecs(600)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "idx2")
    build_ann_index(spark, df, path, n_cells=4)

    # add a batch of exact duplicates of vectors 0..9 under new ids
    dup = df.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    v1 = ann_index_add(spark, dup, path, txn=("ingest", 0))
    v_replay = ann_index_add(spark, dup, path, txn=("ingest", 0))
    assert v_replay == v1  # replay is a no-op

    st = index_stats(spark, path)
    assert st["rows"] == 610 and st["cells"] <= 4

    # the added duplicates are immediately served as top hits
    queries = df.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_index_search(spark, queries, path, k=1, n_probe=1)
    top = {r.query_id: (r.corpus_id, r.cos_sim) for r in got.collect()}
    for q, (cid, sim) in top.items():
        assert cid == q + 10_000 and sim == 1.0


def test_search_reads_fewer_files_than_table(spark, tmp_path):
    """The probe's pruned read must hand Spark strictly fewer files
    when queries concentrate in one cell range."""
    rows = _clustered_vecs(1200)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "idx3")
    t = build_ann_index(spark, df, path, n_cells=8)
    n_all = len(t.read().inputFiles())
    # one query -> one probed cell -> the pruned range is one cell wide
    q1 = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cents = load_centroids(path)
    from data_engineering_pipeline_spark.operators.ann_index import (
        _assign_cell,
    )

    cell = q1.select(
        _assign_cell(F.col("embedding"), cents).alias("c")
    ).collect()[0]["c"]
    pruned = t.read(prune=[("cell", cell, cell)])
    assert len(pruned.inputFiles()) < n_all


def test_ann_index_sink_streaming_exactly_once(spark, tmp_path):
    """Streaming adds through the sink: replayed batches (same app,
    fresh checkpoint) are no-ops; the streamed vectors are served."""
    from data_engineering_pipeline_spark.streaming.sinks import (
        ann_index_sink,
    )

    rows = _clustered_vecs(400)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "sidx")
    build_ann_index(spark, df, path, n_cells=4)

    land = tmp_path / "land"
    land.mkdir()
    dup = df.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding"
    )
    dup.coalesce(1).write.parquet(str(land / "b0"))
    stream = spark.readStream.schema(dup.schema).parquet(
        str(land / "b0")
    )
    ann_index_sink(
        stream, path, str(tmp_path / "ck1"), "vec-ingest"
    ).awaitTermination()
    assert index_stats(spark, path)["rows"] == 405

    # full replay with a fresh checkpoint: nothing doubles
    stream2 = spark.readStream.schema(dup.schema).parquet(
        str(land / "b0")
    )
    ann_index_sink(
        stream2, path, str(tmp_path / "ck2"), "vec-ingest"
    ).awaitTermination()
    assert index_stats(spark, path)["rows"] == 405

    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_index_search(spark, q, path, k=1, n_probe=1)
    assert all(r.corpus_id == r.query_id + 50_000 for r in got.collect())


def test_centroids_versioned_with_snapshot(spark, tmp_path):
    """ADVICE r6: assignments and centroids must swap as one atom. A
    rebuild changes both in a single commit; load_centroids(version=)
    resolves the centroids each version's assignments were computed
    with, and a search issued against the pre-rebuild version stays
    internally consistent."""
    from data_engineering_pipeline_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    rows = _clustered_vecs(600)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "vc")
    build_ann_index(spark, df, path, n_cells=4, seed=7)
    t = SnapshotTable(spark, path)
    v0 = t.latest_version()
    c0 = load_centroids(path, version=v0)
    assert len(c0) == 4

    # rebuild with different geometry: one commit swaps both
    build_ann_index(spark, df, path, n_cells=8, seed=11)
    v1 = t.latest_version()
    assert v1 > v0
    c1 = load_centroids(path)  # head
    assert len(c1) == 8 and c1 != c0
    # time travel: the old version still pairs with the OLD centroids
    assert load_centroids(path, version=v0) == c0
    # and both sidecars exist immutably (content-addressed)
    assert t.properties_at(v0) != t.properties_at(v1)

    # search after the rebuild serves the new index coherently: every
    # query finds a same-blob neighbour (self excluded; blob noise is
    # tiny, so the nearest other member is still near-parallel)
    q = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    hits = ann_index_search(spark, q, path, k=1, n_probe=2).collect()
    assert len(hits) == 5
    assert all(r.cos_sim > 0.95 for r in hits)


def test_add_conflicts_with_concurrent_rebuild(spark, tmp_path):
    """An incremental add whose assignment centroids were superseded
    by a rebuild mid-flight must raise SnapshotConflict, never commit
    rows the new probe would map to wrong cells."""
    import pytest

    from data_engineering_pipeline_spark.sources.snapshot_table import (
        SnapshotConflict,
        SnapshotTable,
    )

    rows = _clustered_vecs(400)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "cr")
    build_ann_index(spark, df, path, n_cells=4, seed=7)

    t = SnapshotTable(spark, path, stat_cols=["cell"])
    orig_stage = SnapshotTable._stage
    fired = {}

    def hooked(self, frame):
        staged = orig_stage(self, frame)
        if not fired and os.path.abspath(self.path) == os.path.abspath(path):
            fired["x"] = True
            # a rebuild lands between the add's staging and its commit
            build_ann_index(spark, df, path, n_cells=8, seed=11)
        return staged

    import os

    SnapshotTable._stage = hooked
    try:
        new = df.filter(F.col("vec_id") < 3).select(
            (F.col("vec_id") + 9000).alias("vec_id"), "embedding"
        )
        with pytest.raises(SnapshotConflict, match="rebuilt"):
            ann_index_add(spark, new, path)
    finally:
        SnapshotTable._stage = orig_stage
    # the conflicted add left nothing visible; the re-run succeeds
    assert index_stats(spark, path)["rows"] == 400
    ann_index_add(spark, new, path)
    assert index_stats(spark, path)["rows"] == 403


@pytest.mark.slow  # heavy e2e/property: close-out tier (pytest.ini)
def test_ivfpq_two_phase_recall_and_column_pruning(spark, tmp_path):
    from data_engineering_pipeline_spark.operators.ann_index import (
        ann_index_search_pq,
    )
    from data_engineering_pipeline_spark.operators.similarity import (
        pq_grid_encode,
    )

    # 64-dim blobs (the PQ grid defaults quantize dims 0,1 of each
    # 16-dim subspace over [-0.5, 0.5])
    rnd = random.Random(5)
    centers = [
        [rnd.uniform(-0.4, 0.4) for _ in range(64)] for _ in range(6)
    ]
    rows = []
    for i in range(900):
        c = centers[i % 6]
        rows.append((i, [x + rnd.gauss(0, 0.03) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivfpq")
    build_ann_index(
        spark, df, path, n_cells=6, code_of=pq_grid_encode
    )
    queries = df.filter(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ann_index_search_pq(
        spark, queries, path, k=5, refine=40, n_probe=2
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    # phase 1's candidate scan projects codes but NOT the vectors —
    # the IO claim of the layout, visible as a parquet ReadSchema
    schemas = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ]
    assert any(
        "codes" in s and "embedding" not in s for s in schemas
    ), schemas
    assert got.count() == 15 * 5

    # with refine >= probed-cell population, phase 1 keeps every
    # candidate and the two-phase result must EQUAL the exact IVF
    # search — the plumbing invariant that isolates ADC-filter loss
    # (within-blob vectors share codes, so small refine trades recall
    # for IO by design) from implementation bugs
    exact = ann_index_search(spark, queries, path, k=5, n_probe=2)
    full = ann_index_search_pq(
        spark, queries, path, k=5, refine=1000, n_probe=2
    )
    assert {tuple(r) for r in full.collect()} == {
        tuple(r) for r in exact.collect()
    }
