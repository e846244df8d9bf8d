"""Dedup queries over the documents table, with DuckDB oracles where the
algorithm is SQL-expressible. MinHash-LSH and SimHash hash with Spark's
xxhash64 (no DuckDB equivalent) -> rows-only driver check; their
correctness is covered by property tests against the exact-Jaccard oracle
path (tests/test_dedup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.dedup import (
    cross_corpus_contamination,
    exact_dedup,
    minhash_lsh_pairs,
    shingle_jaccard_pairs,
    simhash_pairs,
)
from data_engineering_pipeline_spark.sources import load_table

QUERIES = {}
ORACLES = {}

JACCARD_THRESHOLD = 0.7


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@_register(
    "dedup-exact",
    """
    WITH norm AS (
      SELECT doc_id, lang, source, n_chars,
             trim(regexp_replace(regexp_replace(lower(text),
                  '[.,!?;:''"()]', '', 'g'), '\\s+', ' ', 'g')) AS tnorm
      FROM documents
    )
    SELECT doc_id, lang, source, n_chars FROM norm
    QUALIFY row_number() OVER (PARTITION BY tnorm ORDER BY doc_id) = 1
    ORDER BY doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text, keeping the lowest doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    ).orderBy("doc_id")


_JACCARD_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingles
      FROM t WHERE len(toks) >= 3
    ), ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) AS jaccard
    FROM shared
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.7
    ORDER BY id_a, id_b
"""


@_register("dedup-jaccard-pairs", _JACCARD_ORACLE)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram (word-shingle) Jaccard near-dup pairs >= 0.7."""
    docs = load_table(spark, sf_dir, "documents")
    return shingle_jaccard_pairs(
        docs, "doc_id", "text", JACCARD_THRESHOLD
    ).orderBy("id_a", "id_b")


@_register("dedup-minhash-lsh")  # rows-only: xxhash64 not reproducible in DuckDB
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) + LSH(8 bands) candidates, exact-verified >= 0.7 —
    the 100 TB-scale near-dup path. Property-tested against
    dedup-jaccard-pairs in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text", JACCARD_THRESHOLD
    ).orderBy("id_a", "id_b")


@_register("dedup-simhash")  # rows-only: xxhash64 not reproducible in DuckDB
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) via 16-bit chunk banding."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, "doc_id", "text", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


_COMPONENTS_ORACLE = """
    WITH RECURSIVE t AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingles
      FROM t WHERE len(toks) >= 3
    ), ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), pairs AS (
      SELECT id_a, id_b FROM shared
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(c AS DOUBLE) / (sa.n_sh + sb.n_sh - c) >= 0.7
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), walk(v, l) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.b, w.l FROM walk w JOIN edges e ON e.a = w.v
    )
    SELECT v AS doc_id, min(l) AS component FROM walk GROUP BY v
    ORDER BY doc_id
"""


@_register("dedup-components", _COMPONENTS_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components (iterative min-label
    propagation) over the exact-Jaccard pair graph — the step that picks
    one canonical document per duplicate group. Oracle: transitive
    closure via WITH RECURSIVE."""
    from data_engineering_pipeline_spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = shingle_jaccard_pairs(docs, "doc_id", "text", JACCARD_THRESHOLD)
    return connected_components(
        docs.select("doc_id"), pairs, id_col="doc_id",
        src_col="id_a", dst_col="id_b",
    ).orderBy("doc_id")


@_register(
    "text-contamination",
    """
    WITH t AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingles
      FROM t WHERE len(toks) >= 3
    ), ev AS (
      SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
      FROM sh WHERE TRY_CAST(substr(source, 4) AS INTEGER) >= 10
    ), tr AS (
      SELECT DISTINCT unnest(shingles) AS shingle FROM sh
      WHERE TRY_CAST(substr(source, 4) AS INTEGER) < 10
    ), overlap AS (
      SELECT e.doc_id, count(*) AS n_contam
      FROM ev e JOIN tr ON e.shingle = tr.shingle GROUP BY 1
    ), evdocs AS (SELECT DISTINCT doc_id, n_sh FROM ev)
    SELECT d.doc_id, d.n_sh,
           CAST(coalesce(o.n_contam, 0) AS BIGINT) AS n_contam,
           coalesce(o.n_contam, 0) / CAST(d.n_sh AS DOUBLE) AS contamination
    FROM evdocs d LEFT JOIN overlap o ON o.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: treating sources src10+ as the
    held-out corpus and src0-src9 as the training crawl, the fraction
    of each held-out doc's 3-gram shingles that appear anywhere in the
    crawl (operators/dedup.py cross_corpus_contamination)."""
    docs = load_table(spark, sf_dir, "documents")
    srcnum = F.substring("source", 4, 10).try_cast("int")
    train = docs.filter(srcnum < 10)
    eval_df = docs.filter(srcnum >= 10)
    return cross_corpus_contamination(
        train, eval_df, "doc_id", "text", n=3
    ).orderBy("doc_id")
