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
