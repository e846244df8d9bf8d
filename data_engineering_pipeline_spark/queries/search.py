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
