"""Text-analysis queries over the documents table, each with a DuckDB
oracle mirroring the expression semantics exactly (same token split, same
integer arithmetic, same fold order).

Ratios and means here are int/int IEEE divisions — bit-deterministic
across engines, so no rounding is applied (rounding could land on a
representable half and diverge; SURVEY.md §7.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.text import (
    LANG_MARKERS,
    STOPWORDS_EN,
    distinct_token_count,
    fingerprint,
    lang_id,
    lang_scores,
    mean_token_length,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from data_engineering_pipeline_spark.sources import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


@_register(
    "text-stats",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / len(toks) AS mean_token_len,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
             (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
    FROM t ORDER BY doc_id
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + document fingerprint (rolling polynomial hash).
    Tokens materialize once per row in their own projection (no CSE
    across metric expressions — see operators/text.py)."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "text", tokens("text").alias("__toks"))
    t = F.col("__toks")
    return toked.select(
        "doc_id",
        token_count(toks=t).alias("n_tokens"),
        distinct_token_count(toks=t).alias("n_distinct"),
        mean_token_length(toks=t).alias("mean_token_len"),
        fingerprint("text").alias("fingerprint"),
    ).orderBy("doc_id")


_STOP_SQL = "(" + ", ".join(f"'{s}'" for s in STOPWORDS_EN) + ")"

@_register(
    "text-quality",
    f"""
    WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
          / len(toks) AS stopword_ratio,
        CAST(length(text) - length(regexp_replace(text,
             '[.,!?;:''"()]', '', 'g')) AS DOUBLE) / length(text)
          AS punct_ratio,
        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS diversity
      FROM t
    )
    SELECT doc_id, n_tokens, stopword_ratio, punct_ratio, diversity,
      greatest(least(
        0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
        + 0.4 * diversity
        + 0.2 * least(stopword_ratio * 2.0, 1.0)
        - 0.2 * least(punct_ratio * 4.0, 1.0), 1.0), 0.0) AS quality
    FROM m ORDER BY doc_id
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punct/stopword ratios + composite score."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "text", tokens("text").alias("__toks"))
    t = F.col("__toks")
    return toked.select(
        "doc_id",
        token_count(toks=t).alias("n_tokens"),
        stopword_ratio(toks=t).alias("stopword_ratio"),
        punct_ratio("text").alias("punct_ratio"),
        (
            distinct_token_count(toks=t).cast("double") / token_count(toks=t)
        ).alias("diversity"),
        quality_score("text", toks=t).alias("quality"),
    ).orderBy("doc_id")


def _markers_sql(lang: str) -> str:
    return "(" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + ")"


_LANG_SCORE_COLS = ",\n        ".join(
    f"CAST(len(list_filter(toks, x -> x IN {_markers_sql(lang)})) AS INTEGER)"
    f" AS score_{lang}"
    for lang in LANG_MARKERS
)

# Mirrors operators/text.py lang_id (fold-left, earliest language wins
# ties): language L wins iff strictly greater than every EARLIER
# language's score — hence the reverse-order CASE, each arm comparing
# only against languages before it.
_LANG_PRED = """
      CASE
        WHEN score_zh > greatest(score_en, score_de, score_es, score_fr, 0)
          THEN 'zh'
        WHEN score_fr > greatest(score_en, score_de, score_es, 0)
          THEN 'fr'
        WHEN score_es > greatest(score_en, score_de, 0) THEN 'es'
        WHEN score_de > greatest(score_en, 0) THEN 'de'
        WHEN score_en > 0 THEN 'en'
        ELSE 'und'
      END
"""

@_register(
    "text-langid",
    f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents),
    s AS (
      SELECT doc_id, lang,
        {_LANG_SCORE_COLS}
      FROM t
    )
    SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
           {_LANG_PRED} AS lang_pred
    FROM s ORDER BY doc_id
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic: per-language scores + argmax
    (earliest language wins ties; 'und' when nothing matches)."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "lang", tokens("text").alias("__toks"))
    t = F.col("__toks")
    scores = lang_scores(toks=t)
    return toked.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        lang_id(toks=t).alias("lang_pred"),
    ).orderBy("doc_id")


@_register(
    "text-filter",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS INTEGER) AS n_tokens,
        CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
          / len(toks) AS mean_token_len,
        CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS diversity,
        CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS INTEGER)
          AS n_stopwords,
        CAST(list_max(list_transform(list_distinct(toks),
               d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
          / len(toks) AS top_token_ratio
      FROM t
    )
    SELECT doc_id, n_tokens, mean_token_len, diversity, n_stopwords,
           top_token_ratio,
           (n_tokens BETWEEN 25 AND 90) AS r_len,
           (mean_token_len >= 4.0 AND mean_token_len <= 5.0) AS r_mean_len,
           (n_stopwords >= 2) AS r_stopwords,
           (diversity >= 0.4) AS r_diversity,
           (top_token_ratio <= 0.1) AS r_repetition,
           ((n_tokens BETWEEN 25 AND 90)
            AND mean_token_len >= 4.0 AND mean_token_len <= 5.0
            AND n_stopwords >= 2 AND diversity >= 0.4
            AND top_token_ratio <= 0.1) AS keep
    FROM m ORDER BY doc_id
    """,
)
def text_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality filter (Rae et al. 2021 §A1.1,
    adapted to the synthetic corpus): per-doc rule flags — token-count
    band, mean-token-length band, stopword floor, lexical-diversity
    floor, top-token-dominance cap — plus the conjunctive keep decision.
    Flags are emitted (not just the kept rows) because a real pipeline
    audits per-rule rejection rates before applying the filter.

    Scale: pure per-row map work over one tokenization pass — no
    shuffle, whole-stage codegen end to end; the top-token scan is
    O(distinct * tokens) per row, bounded by document length. All
    ratios are int/int IEEE divisions, so the DuckDB oracle matches
    with zero float tolerance."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", tokens("text").alias("__toks"))
    t = F.col("__toks")
    top_freq = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda d: F.size(F.filter(t, lambda x: x == d)),
        )
    )
    m = toked.select(
        "doc_id",
        token_count(toks=t).alias("n_tokens"),
        mean_token_length(toks=t).alias("mean_token_len"),
        (
            distinct_token_count(toks=t).cast("double") / token_count(toks=t)
        ).alias("diversity"),
        F.size(
            F.filter(
                t,
                lambda x: F.array_contains(
                    F.array(*[F.lit(s) for s in STOPWORDS_EN]), x
                ),
            )
        ).alias("n_stopwords"),
        (top_freq.cast("double") / token_count(toks=t)).alias(
            "top_token_ratio"
        ),
    )
    r_len = F.col("n_tokens").between(25, 90)
    r_mtl = (F.col("mean_token_len") >= 4.0) & (F.col("mean_token_len") <= 5.0)
    r_stop = F.col("n_stopwords") >= 2
    r_div = F.col("diversity") >= 0.4
    r_rep = F.col("top_token_ratio") <= 0.1
    return m.select(
        "*",
        r_len.alias("r_len"),
        r_mtl.alias("r_mean_len"),
        r_stop.alias("r_stopwords"),
        r_div.alias("r_diversity"),
        r_rep.alias("r_repetition"),
        (r_len & r_mtl & r_stop & r_div & r_rep).alias("keep"),
    ).orderBy("doc_id")


@_register(
    "text-vocab",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    ex AS (SELECT doc_id, unnest(toks) AS token FROM t)
    SELECT token, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM ex GROUP BY token
    ORDER BY n_occurrences DESC, token LIMIT 100
    """,
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by occurrence count with
    document frequency — the vocabulary/BPE-seeding pass of a training
    pipeline.

    Scale: explode + two-level aggregation; the token groupBy partial-
    aggregates map-side so the shuffle carries one row per distinct
    token per partition, and the top-100 is TakeOrderedAndProject (no
    global sort). Stop-token skew is absorbed by the partial agg."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
    ex = docs.select("doc_id", F.explode(toks).alias("token"))
    return (
        ex.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(100)
    )
