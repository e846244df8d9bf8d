"""Property tests for similarity search: the LSH path is approximate
(rows-only driver check), so pin it to the brute-force ground truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.similarity import (
    ann_topk_brute,
    ann_topk_lsh,
)
from data_engineering_pipeline_spark.sources import load_table


def _qc(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    return queries, corpus


def test_lsh_scores_are_exact_and_no_self_matches(spark, sf_smoke):
    """Every LSH hit's cosine must equal the brute-force cosine for the
    same pair (the approximation is WHICH pairs are scored, never the
    score itself)."""
    queries, corpus = _qc(spark, sf_smoke)
    brute = ann_topk_brute(queries, corpus, k=len(corpus.collect()))
    lsh = ann_topk_lsh(queries, corpus, dim=64, k=5)
    joined = lsh.alias("l").join(
        brute.alias("b"),
        (F.col("l.query_id") == F.col("b.query_id"))
        & (F.col("l.corpus_id") == F.col("b.corpus_id")),
    )
    bad = joined.filter(F.col("l.cos_sim") != F.col("b.cos_sim")).count()
    assert bad == 0
    assert lsh.filter(F.col("query_id") == F.col("corpus_id")).count() == 0


def test_lsh_recall_at_5(spark, sf_smoke):
    queries, corpus = _qc(spark, sf_smoke)
    brute = {
        (r.query_id, r.corpus_id)
        for r in ann_topk_brute(queries, corpus, k=5).collect()
    }
    lsh = {
        (r.query_id, r.corpus_id)
        for r in ann_topk_lsh(
            queries, corpus, dim=64, k=5, bits=4, n_tables=16
        ).collect()
    }
    recall = len(brute & lsh) / len(brute)
    # measured 0.96 with these params on this corpus; guard with margin
    assert recall >= 0.7, f"LSH recall@5 {recall}"


def test_ivf_scores_exact_and_recall(spark, sf_smoke):
    from data_engineering_pipeline_spark.operators.similarity import (
        ann_topk_ivf,
    )

    queries, corpus = _qc(spark, sf_smoke)
    brute_full = ann_topk_brute(queries, corpus, k=500)
    ivf = ann_topk_ivf(queries, corpus, k=5, n_cells=16, n_probe=8)
    joined = ivf.alias("i").join(
        brute_full.alias("b"),
        (F.col("i.query_id") == F.col("b.query_id"))
        & (F.col("i.corpus_id") == F.col("b.corpus_id")),
    )
    assert joined.filter(F.col("i.cos_sim") != F.col("b.cos_sim")).count() == 0

    brute5 = {
        (r.query_id, r.corpus_id)
        for r in ann_topk_brute(queries, corpus, k=5).collect()
    }
    got = {(r.query_id, r.corpus_id) for r in ivf.collect()}
    recall = len(brute5 & got) / len(brute5)
    assert recall >= 0.6, f"IVF recall@5 {recall}"  # measured 0.83
    # (synthetic near-uniform 64-d vectors are an adversarial case for
    # IVF: neighbors spread across cells, so recall/cost is inherently
    # data-dependent; on clustered real embeddings the same settings
    # probe 8/16 cells for ~0.95+)


def test_embedding_centroids_match_numpy(spark, sf_smoke):
    """The distributed posexplode+avg centroid equals a local NumPy mean
    (float tolerance — summation order differs, which is also why this
    query is rows-only for the oracle gate)."""
    import numpy as np

    from data_engineering_pipeline_spark.queries.similarity import (
        embedding_centroids,
    )
    from data_engineering_pipeline_spark.sources import load_table

    got = {
        r["label"]: (np.array(r["centroid"]), r["n_members"])
        for r in embedding_centroids(spark, sf_smoke).collect()
    }
    by_label: dict[int, list] = {}
    for r in load_table(spark, sf_smoke, "embeddings").collect():
        by_label.setdefault(r["label"], []).append(
            np.array(r["embedding"], dtype=np.float64)
        )
    assert set(got) == set(by_label)
    for lbl, vecs in by_label.items():
        assert got[lbl][1] == len(vecs)
        assert np.allclose(got[lbl][0], np.mean(np.stack(vecs), axis=0), atol=1e-9)
