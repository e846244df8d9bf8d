"""BM25 keyword-search query over documents, oracle-checked: the DuckDB
SQL mirrors the Spark expression tree exactly (same literal folding —
e.g. Python pre-computes 1-b=0.25 and k1+1=2.2 — same parenthesization,
so doubles match bit-for-bit before the final 4-dp round)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_engineering_pipeline_spark.operators.search import bm25_scores
from data_engineering_pipeline_spark.sources import load_table

QUERIES = {}
ORACLES = {}

QUERY_TERMS = ["spark", "window", "merge"]

_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_TERMS_SQL = "(" + ", ".join(f"'{t}'" for t in QUERY_TERMS) + ")"


def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranking of documents for a fixed keyword query."""
    docs = load_table(spark, sf_dir, "documents")
    return bm25_scores(docs, QUERY_TERMS)


QUERIES["text-bm25"] = text_bm25

ORACLES["text-bm25"] = f"""
    WITH t2 AS (
      SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS dl FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avg_dl FROM t2),
    postings AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, dl, unnest(toks) AS term FROM t2)
      WHERE term IN {_TERMS_SQL}
      GROUP BY doc_id, term, dl
    ),
    dfs AS (SELECT term, count(DISTINCT doc_id) AS df
            FROM postings GROUP BY term),
    scored AS (
      SELECT p.doc_id, p.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * 2.2)
               / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avg_dl)) AS w
      FROM postings p JOIN dfs d USING (term) CROSS JOIN stats s
    )
    SELECT doc_id, round(sum(w), 4) AS score,
           count(DISTINCT term) AS n_matched
    FROM scored GROUP BY doc_id
    ORDER BY score DESC, doc_id
"""

# Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of
# the lexical BM25 arm and the semantic cosine arm — the standard
# hybrid-retrieval combiner. RRF contributions are SCALED-INTEGER
# reciprocals (10^9 div (60 + rank)) so the fused score is exact int64
# arithmetic: no float-sum ordering issues cross-engine, and the sum is
# order-independent. Each arm's rank comes from its own engine-stable
# ordering (rounded score desc, id).
RRF_K = 60
RRF_SCALE = 1_000_000_000
RRF_ARM_DEPTH = 50
RRF_TOP = 20
_SEM_QUERY_VEC = 0  # vec_id used as the semantic query


def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 (fixed keyword query) fused with
    brute-cosine top-50 (embedding of vec 0 as the semantic query) by
    reciprocal-rank fusion; final top-20 by fused score. Scale: each
    arm is its own production operator (inverted-posting BM25; the
    brute arm swaps for ann-topk-ivf/-pq at corpus scale — identical
    (doc_id, rank) contract), and fusion touches only 2 * ARM_DEPTH
    rows — a driver-sized full outer join, never the corpus."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_engineering_pipeline_spark.operators.similarity import (
        ann_topk_brute,
    )

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = bm25_scores(docs, QUERY_TERMS)
    wl = Window.orderBy(F.desc("score"), "doc_id")
    lexr = (
        lex.withColumn("rank_lex", F.row_number().over(wl))
        .filter(F.col("rank_lex") <= RRF_ARM_DEPTH)
        .select("doc_id", "rank_lex")
    )
    q = emb.filter(F.col("vec_id") == _SEM_QUERY_VEC).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.select(F.col("vec_id").alias("corpus_id"), "embedding")
    semr = (
        ann_topk_brute(q, corpus, k=RRF_ARM_DEPTH)
        .select(
            F.col("corpus_id").alias("doc_id"),
            F.col("rank").alias("rank_sem"),
        )
    )
    fused = lexr.join(semr, "doc_id", "outer").withColumn(
        "rrf",
        F.expr(
            f"coalesce({RRF_SCALE} div ({RRF_K} + rank_lex), 0)"
            f" + coalesce({RRF_SCALE} div ({RRF_K} + rank_sem), 0)"
        ).cast("long"),
    )
    wf = Window.orderBy(F.desc("rrf"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= RRF_TOP)
        .select("rank", "doc_id", "rrf", "rank_lex", "rank_sem")
        .orderBy("rank")
    )


QUERIES["search-hybrid-rrf"] = search_hybrid_rrf

_VECS_SQL = """
    e AS (SELECT vec_id,
                 list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings),
    nv AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
"""

ORACLES["search-hybrid-rrf"] = f"""
    WITH t2 AS (
      SELECT doc_id, {_TOKS} AS toks, len({_TOKS}) AS dl FROM documents
    ),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avg_dl FROM t2),
    postings AS (
      SELECT doc_id, dl, term, count(*) AS tf FROM (
        SELECT doc_id, dl, unnest(toks) AS term FROM t2)
      WHERE term IN {_TERMS_SQL}
      GROUP BY doc_id, term, dl
    ),
    dfs AS (SELECT term, count(DISTINCT doc_id) AS df
            FROM postings GROUP BY term),
    scored AS (
      SELECT p.doc_id, p.term,
             ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
               * (p.tf * 2.2)
               / (p.tf + 1.2 * (0.25 + 0.75 * p.dl / s.avg_dl)) AS w
      FROM postings p JOIN dfs d USING (term) CROSS JOIN stats s
    ),
    lex AS (SELECT doc_id, round(sum(w), 4) AS score
            FROM scored GROUP BY doc_id),
    lexr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                  AS INTEGER) AS rank_lex
      FROM lex QUALIFY rank_lex <= {RRF_ARM_DEPTH}
    ),
    {_VECS_SQL},
    qv AS (SELECT v AS qvec, nrm AS qn FROM nv
           WHERE vec_id = {_SEM_QUERY_VEC}),
    sems AS (
      SELECT c.vec_id AS doc_id,
             round(list_dot_product(q.qvec, c.v) / (q.qn * c.nrm), 4)
               AS cos_sim
      FROM qv q, nv c WHERE c.vec_id <> {_SEM_QUERY_VEC}
    ),
    semr AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY cos_sim DESC, doc_id)
                  AS INTEGER) AS rank_sem
      FROM sems QUALIFY rank_sem <= {RRF_ARM_DEPTH}
    ),
    fused AS (
      SELECT doc_id, rank_lex, rank_sem,
             CAST(coalesce({RRF_SCALE} // ({RRF_K} + rank_lex), 0)
                  + coalesce({RRF_SCALE} // ({RRF_K} + rank_sem), 0)
                  AS BIGINT) AS rrf
      FROM lexr FULL JOIN semr USING (doc_id)
    )
    SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id)
                AS INTEGER) AS "rank",
           doc_id, rrf, rank_lex, rank_sem
    FROM fused QUALIFY "rank" <= {RRF_TOP}
    ORDER BY "rank"
"""
