"""Keyword search scoring (TF-IDF / BM25) over a document corpus —
inverted-index mechanics as DataFrame ops: explode tokens, filter to the
query terms EARLY (the index probe), aggregate term frequencies, join
tiny per-term document frequencies, score and rank.

Scale shape: the big explode is filtered to |query| terms before any
shuffle, so the shuffled volume is O(matching postings), not O(corpus
tokens); document frequencies and the corpus stats are dimension-sized
and broadcast. This is what a distributed search engine's query path
compiles to, expressed in Spark."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.text import tokens

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_n: int | None = None,
    scale: int = 4,
) -> DataFrame:
    """BM25 score per document for `query_terms` (docs matching at least
    one term). Output: (id, score, n_matched) ranked by (score desc, id).

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); tf normalized by document
    length against the corpus average."""
    toked = docs.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).select(F.col(id_col), "__toks", F.size("__toks").alias("dl"))

    stats = toked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avg_dl"),
    )

    term_arr = F.array(*[F.lit(t) for t in query_terms])
    postings = (
        toked.select(
            F.col(id_col), "dl", F.explode("__toks").alias("term")
        )
        .filter(F.array_contains(term_arr, F.col("term")))  # index probe
        .groupBy(id_col, "term", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )

    df_per_term = postings.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )

    scored = (
        postings.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl"))
            ),
        )
    )
    out = (
        scored.groupBy(id_col)
        .agg(
            F.round(F.sum("w"), scale).alias("score"),
            F.countDistinct("term").alias("n_matched"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col))
    )
    if top_n is not None:
        w = Window.orderBy(F.col("score").desc(), F.col(id_col))
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= top_n)
            .drop("__rn")
        )
    return out
