"""Persistent IVF vector index AS A SNAPSHOT TABLE — the managed-index
architecture: cell assignments live in the transactional table format
(sources/snapshot_table.py), cell-clustered so the manifest min/max on
`cell` lets a probe SKIP every file holding no probed cell, and new
vectors append incrementally under the same commit protocol as any
other table write.

Why this shape at 100 TB:
- ann_topk_ivf (operators/similarity.py) re-assigns the corpus on
  every call; an index you BUILD ONCE and serve many queries from must
  persist the assignment. Storing it as a snapshot table buys, for
  free, everything the format already guarantees: atomic index swaps,
  time travel to yesterday's index, crash-safe incremental adds,
  compaction, retention.
- Cell-clustered files (repartition by cell before append, stat_cols
  = ["cell"]) turn the file-level stat pruning into the IVF probe: a
  search touching cells {3, 7} opens only the files whose [min, max]
  cell range intersects — the same IO discipline a dedicated vector
  store's posting lists give, expressed with parquet + manifests.
- Centroids are the only side state (k x dim floats, a JSON sidecar
  written tmp+rename): tiny, immutable per build, re-derived only by
  a full rebuild.

Incremental adds assign to the FROZEN centroids — standard IVF
practice: cells drift as the distribution moves, recall decays
gracefully, and a periodic rebuild() recenters; the imbalance metric
(max cell share) tells the scheduler when.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.similarity import (
    _as_double,
    _cell_scores,
    cosine,
    train_ivf_centroids,
)
from data_engineering_pipeline_spark.sources.snapshot_table import (
    SnapshotTable,
)


def _centroids_path(path: str) -> str:
    return os.path.join(path, "_index", "centroids.json")


def _write_centroids(path: str, cents: list[list[float]]) -> None:
    d = os.path.dirname(_centroids_path(path))
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".cent-{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as fh:
        json.dump(cents, fh)
    os.rename(tmp, _centroids_path(path))


def load_centroids(path: str) -> list[list[float]]:
    with open(_centroids_path(path)) as fh:
        return json.load(fh)


def _assign_cell(vec_col, centroids) -> F.Column:
    """argmax cell of the raw vector against the unit centroids (raw
    dot ranks like cosine — |v| is constant across cells)."""
    scores = _cell_scores(vec_col, centroids)
    return F.array_max(scores)["idx"].cast("long")


def _clustered(df: DataFrame, n_cells: int) -> DataFrame:
    """Range-partition + sort by cell so each output file covers a
    tight cell range — the layout that makes probe-time file skipping
    effective. File count ~ min(n_cells, data size / file size)."""
    return df.repartitionByRange(
        max(1, min(n_cells, 32)), "cell"
    ).sortWithinPartitions("cell")


def build_ann_index(
    spark: SparkSession,
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 7,
    cell_of=None,
) -> SnapshotTable:
    """Build (or atomically REPLACE) the index: train centroids on the
    corpus (or use a caller-supplied deterministic `cell_of` quantizer
    — the oracle-gradeable config), assign every vector, and overwrite
    the snapshot table with the cell-clustered layout."""
    t = SnapshotTable(spark, path, stat_cols=["cell"])
    v = _as_double(F.col(vec_col))
    if cell_of is not None:
        cell = cell_of(F.col(vec_col))
        cents: list[list[float]] = []
    else:
        cents = train_ivf_centroids(
            corpus, vec_col, n_cells=n_cells, seed=seed
        )
        cell = _assign_cell(F.col(vec_col), cents)
    rows = corpus.select(
        F.col(id_col).alias("vec_id"),
        v.alias("embedding"),
        cell.alias("cell"),
    )
    t.overwrite(_clustered(rows, n_cells))
    _write_centroids(path, cents)
    return t


def ann_index_add(
    spark: SparkSession,
    new_vecs: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_of=None,
    txn: tuple[str, int] | None = None,
) -> int:
    """Incremental add: assign to the FROZEN centroids (or the same
    deterministic quantizer) and append cell-clustered files. Rides
    the table's txn protocol, so a streaming foreachBatch add is
    exactly-once."""
    t = SnapshotTable(spark, path, stat_cols=["cell"])
    if cell_of is not None:
        cell = cell_of(F.col(vec_col))
        n_cells = 32
    else:
        cents = load_centroids(path)
        cell = _assign_cell(F.col(vec_col), cents)
        n_cells = len(cents)
    rows = new_vecs.select(
        F.col(id_col).alias("vec_id"),
        _as_double(F.col(vec_col)).alias("embedding"),
        cell.alias("cell"),
    )
    return t.append(_clustered(rows, n_cells), txn=txn)


def ann_index_search(
    spark: SparkSession,
    queries: DataFrame,
    path: str,
    query_id: str = "query_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 1,
    cell_of=None,
    broadcast_probes: bool = True,
) -> DataFrame:
    """Serve top-k from the persisted index: each query probes its
    n_probe nearest cells (or its own deterministic cell), the index
    read is FILE-PRUNED to the probed cell range before Spark plans
    the scan, and candidates equi-join on cell — one shuffle on the
    probe pairs, never a corpus scan.

    Returns (query_id, corpus_id, cos_sim, rank<=k), cosine rounded
    4dp with corpus_id tie-break (the engine-independent ordering the
    oracle reproduces)."""
    if cell_of is not None:
        probes = queries.select(
            F.col(query_id),
            _as_double(F.col(vec_col)).alias("__qv"),
            cell_of(F.col(vec_col)).alias("cell"),
        )
    else:
        cents = load_centroids(path)
        scores = _cell_scores(F.col(vec_col), cents)
        ranked = F.slice(
            F.reverse(F.array_sort(scores)), 1, n_probe
        )
        probes = queries.select(
            F.col(query_id),
            _as_double(F.col(vec_col)).alias("__qv"),
            F.explode(
                F.transform(ranked, lambda s: s["idx"].cast("long"))
            ).alias("cell"),
        )
    t = SnapshotTable(spark, path, stat_cols=["cell"])
    # one driver-side pass collects the DISTINCT probed cells (bounded
    # by n_cells, tiny); the point-set prune then keeps only files
    # whose cell range can hold one of them — a min..max range would
    # be defeated the moment a query batch probes scattered cells
    cells = [
        r["cell"]
        for r in probes.select("cell").distinct().collect()
    ]
    idx = t.read(prune=[("cell", cells)])
    # a CONCENTRATED query batch prunes down to very few files, and one
    # parquet file is one scan task — the whole candidate join would
    # run on one core. Re-spread the (small, pruned) index side so the
    # per-pair cosine work parallelizes; measured 2.2x on a one-cell
    # batch at 200k vecs (BASELINE.md addendum 7).
    par = spark.sparkContext.defaultParallelism
    if len(idx.inputFiles()) < par:
        idx = idx.repartition(par)
    # broadcast the probe side (queries x n_probe rows — tiny for an
    # online batch) so the cell equi-join does NOT re-shuffle the index
    # by cell: a concentrated batch probing ONE cell would otherwise
    # collapse the whole candidate join onto a single partition no
    # matter how the scan side was spread. For offline mega-batches of
    # queries pass broadcast_probes=False (shuffle join + AQE skew).
    probe_side = F.broadcast(probes) if broadcast_probes else probes
    scored = (
        probe_side.join(idx, "cell")
        .filter(F.col("vec_id") != F.col(query_id))
        .select(
            query_id,
            F.col("vec_id").alias("corpus_id"),
            F.round(
                cosine(F.col("__qv"), F.col("embedding")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.desc("cos_sim"), "corpus_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy(query_id, "rank")
    )


def index_stats(spark: SparkSession, path: str) -> dict:
    """Cell-balance health: total rows, live files, max cell share —
    the rebuild trigger (a drifted distribution concentrates adds in
    few cells, inflating probe cost)."""
    t = SnapshotTable(spark, path, stat_cols=["cell"])
    per_cell = (
        t.read().groupBy("cell").count().collect()
    )
    total = sum(r["count"] for r in per_cell)
    mx = max((r["count"] for r in per_cell), default=0)
    return {
        "rows": total,
        "files": len(t._live_files()),
        "cells": len(per_cell),
        "max_cell_share": (mx / total) if total else 0.0,
    }
