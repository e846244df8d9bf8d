"""Corpus-curation queries: sub-document dedup, PII scrubbing, domain
mixture rebalancing, and sequence packing — the remaining steps between
a filtered corpus and a training run. Every query has an exact DuckDB
oracle (integer arithmetic / verbatim strings end to end; the one
sequential operator, packing, is mirrored by a recursive CTE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.dedup import chunk_dedup
from data_engineering_pipeline_spark.operators.packing import (
    pack_greedy,
    pack_report,
)
from data_engineering_pipeline_spark.operators.sampling import (
    mixture_rebalance,
)
from data_engineering_pipeline_spark.operators.text import (
    PII_PATTERNS,
    pii_counts,
    redact_pii,
    tokens,
)
from data_engineering_pipeline_spark.queries.text import _STOP_SQL, _TOKS
from data_engineering_pipeline_spark.sources import load_table
from data_engineering_pipeline_spark._tmpdirs import fresh_tmpdir

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_CHUNK = 10

@_register(
    "curation-chunk-dedup",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    c AS (
      SELECT doc_id,
             CAST(ceil(len(toks) / {_CHUNK}.0) AS BIGINT) AS n_chunks,
             CASE WHEN len(toks) > 0 THEN
               list_transform(
                 generate_series(1,
                   CAST(ceil(len(toks) / {_CHUNK}.0) AS BIGINT)),
                 i -> array_to_string(
                        toks[(i-1)*{_CHUNK}+1 : i*{_CHUNK}], ' '))
             ELSE CAST([] AS VARCHAR[]) END AS chunks
      FROM t
    ),
    ex AS (
      SELECT doc_id, unnest(chunks) AS chunk,
             unnest(generate_series(1, len(chunks))) - 1 AS pos
      FROM c
    ),
    kept AS (
      SELECT doc_id, pos, chunk FROM ex
      QUALIFY row_number()
        OVER (PARTITION BY chunk ORDER BY doc_id, pos) = 1
    ),
    r AS (
      SELECT doc_id, count(*) AS n_kept,
             string_agg(chunk, ' ' ORDER BY pos) AS dedup_text
      FROM kept GROUP BY doc_id
    )
    SELECT c.doc_id, c.n_chunks,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
           coalesce(r.dedup_text, '') AS dedup_text
    FROM c LEFT JOIN r ON r.doc_id = c.doc_id
    ORDER BY c.doc_id
    """,
)
def curation_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style sub-document dedup (Wenzek et al. 2019): every
    10-token chunk keeps only its first corpus-wide occurrence and each
    document is rebuilt from its surviving chunks — catches shared
    boilerplate that whole-document dedup misses. See
    operators/dedup.py chunk_dedup for the plan-shape notes."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_dedup(docs, "doc_id", "text", _CHUNK).orderBy("doc_id")


# Synthetic PII augmentation: the fixture corpus is PII-free, so both
# engines append an identical deterministic contact line (pure string
# concat of existing columns) and the redaction is graded on that.
_EMAIL_PAT, _PHONE_PAT, _IP_PAT = (p for _, p, _ in PII_PATTERNS)

_AUG_SQL = (
    "text || ' contact ' || source || '.' || lang"
    " || CAST(doc_id AS VARCHAR) || '@example.com or 202-555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 13) % 256 AS VARCHAR)"
)

@_register(
    "curation-pii-redact",
    f"""
    WITH a AS (SELECT doc_id, {_AUG_SQL} AS aug FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(aug, '{_EMAIL_PAT}'))
                AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(aug, '{_PHONE_PAT}'))
                AS INTEGER) AS n_phones,
           CAST(len(regexp_extract_all(aug, '{_IP_PAT}'))
                AS INTEGER) AS n_ips,
           regexp_replace(regexp_replace(regexp_replace(aug,
             '{_EMAIL_PAT}', '<EMAIL>', 'g'),
             '{_PHONE_PAT}', '<PHONE>', 'g'),
             '{_IP_PAT}', '<IP>', 'g') AS redacted
    FROM a ORDER BY doc_id
    """,
)
def curation_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails / phone numbers / IPv4) with per-rule
    match counts — the audit-then-redact pass every training corpus
    gets. Patterns are the Java-regex/RE2 common subset so the oracle
    runs the identical strings.

    Scale: pure per-row regexp map work over one scan — no shuffle,
    whole-stage codegen; counts are computed on the raw text so the
    audit is independent of redaction order."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"), F.lit(" contact "), F.col("source"), F.lit("."),
        F.col("lang"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 202-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 13) % 256).cast("string"),
    )
    a = docs.select("doc_id", aug.alias("__aug"))
    counts = pii_counts(F.col("__aug"))
    return a.select(
        "doc_id",
        counts["email"].alias("n_emails"),
        counts["phone"].alias("n_phones"),
        counts["ip"].alias("n_ips"),
        redact_pii(F.col("__aug")).alias("redacted"),
    ).orderBy("doc_id")


@_register(
    "curation-mixture",
    """
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
               GROUP BY lang),
    p AS (SELECT lang, n_docs,
                 (min(n_docs) OVER ()) * 1000000 // n_docs AS keep_ppm
          FROM c),
    k AS (
      SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN p USING (lang)
      WHERE ((d.doc_id * 69069 + 1) % 4294967296) % 1000000 < p.keep_ppm
      GROUP BY d.lang
    )
    SELECT p.lang, CAST(p.n_docs AS BIGINT) AS n_docs,
           CAST(p.keep_ppm AS BIGINT) AS keep_ppm,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM p LEFT JOIN k ON k.lang = p.lang
    ORDER BY p.lang
    """,
)
def curation_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalance report: downsample every language to
    the smallest one via the deterministic per-million hash filter
    (operators/sampling.py mixture_rebalance), reporting per-language
    input size, keep rate (ppm), and surviving count.

    Scale: the corpus is filtered in place with NO shuffle — only the
    |strata|-row count tables shuffle/broadcast; see the operator."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    mn = counts.agg(F.min("n_docs").alias("__min_n"))
    ppm = counts.join(F.broadcast(mn)).select(
        "lang",
        "n_docs",
        F.expr("__min_n * 1000000 DIV n_docs").alias("keep_ppm"),
    )
    kept = (
        mixture_rebalance(docs, "lang", F.col("doc_id"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__n_kept"))
    )
    return (
        ppm.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            "keep_ppm",
            F.coalesce("__n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )


_BUDGET = 256

@_register(
    "curation-pack",
    f"""
    WITH RECURSIVE t AS (
      SELECT doc_id,
             CAST(coalesce(len({_TOKS}), 0) AS BIGINT) AS n_tokens
      FROM documents
    ),
    s AS (SELECT doc_id, n_tokens,
                 row_number() OVER (ORDER BY doc_id) AS rn
          FROM t),
    p AS (
      SELECT rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS pack_id,
             n_tokens AS fill
      FROM s WHERE rn = 1
      UNION ALL
      SELECT s.rn, s.doc_id, s.n_tokens,
             CASE WHEN p.fill + s.n_tokens <= {_BUDGET}
                  THEN p.pack_id ELSE p.pack_id + 1 END,
             CASE WHEN p.fill + s.n_tokens <= {_BUDGET}
                  THEN p.fill + s.n_tokens ELSE s.n_tokens END
      FROM s JOIN p ON s.rn = p.rn + 1
    )
    SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM p GROUP BY pack_id ORDER BY pack_id
    """,
)
def curation_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: documents in doc_id order are greedily packed
    into <= 256-token training sequences (no doc splitting; a pack
    closes when the next doc would overflow), reported as a per-pack
    manifest. The greedy recurrence is inherently sequential, so Spark
    runs it as Arrow-batched applyInPandas over doc-id buckets
    (operators/packing.py — the graded config is one bucket == the
    exact global pack, mirrored by the oracle's recursive CTE; the
    scale path packs buckets independently at the cost of one
    underfilled pack per bucket boundary)."""
    docs = load_table(spark, sf_dir, "documents")
    # null text -> 0 tokens (an empty doc packs as weight 0), not a
    # NULL weight — pack_greedy fails loudly on NULL by design, and a
    # single null-text row must not kill the whole packing job (r10
    # review; the oracle's coalesce mirrors this)
    weighted = docs.select(
        "doc_id",
        F.coalesce(F.size(tokens("text")), F.lit(0)).alias("n_tokens"),
    )
    return pack_report(pack_greedy(weighted, _BUDGET))


def _classify_oracle_sql() -> str:
    # Mirrors operators/classify.py featurize() + frozen_margin():
    # identical token split, identical zero-token guards (featurize's
    # _safe), identical left-to-right margin fold — every feature is an
    # int/int IEEE division, so margin is bit-identical across engines.
    from data_engineering_pipeline_spark.operators.classify import (
        frozen_margin_sql,
    )

    return f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    m AS (
      SELECT doc_id,
        CAST(len(toks) AS DOUBLE) AS n_tokens,
        CASE WHEN len(toks) > 0 THEN
          CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
            / len(toks) ELSE 0.0 END AS mean_token_len,
        CASE WHEN len(toks) > 0 THEN
          CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
          ELSE 0.0 END AS diversity,
        CASE WHEN len(toks) > 0 THEN
          CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS DOUBLE)
            / len(toks) ELSE 0.0 END AS stopword_ratio,
        CAST(len(list_filter(toks, x -> x IN {_STOP_SQL})) AS INTEGER)
          AS n_stopwords,
        CASE WHEN len(toks) > 0 THEN
          CAST(list_max(list_transform(list_distinct(toks),
                 d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE)
            / len(toks) ELSE 0.0 END AS top_token_ratio
      FROM t
    ),
    f AS (
      SELECT *, abs(n_tokens - 57.5) AS len_band_dev,
             abs(mean_token_len - 4.5) AS mtl_band_dev,
             ((n_tokens BETWEEN 25 AND 90)
              AND mean_token_len >= 4.0 AND mean_token_len <= 5.0
              AND n_stopwords >= 2 AND diversity >= 0.4
              AND top_token_ratio <= 0.1) AS teacher_keep
      FROM m
    )
    SELECT doc_id, teacher_keep,
           ({frozen_margin_sql()}) AS margin,
           ({frozen_margin_sql()}) > 0 AS model_keep,
           ((({frozen_margin_sql()}) > 0) = teacher_keep) AS agrees
    FROM f ORDER BY doc_id
    """


@_register("classify-quality", _classify_oracle_sql())
def classify_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier corpus scoring with the FROZEN distilled LR
    (operators/classify.py FROZEN_COEF — trained offline by
    train_quality_model, scaler folded in): featurize every document,
    emit the linear margin, the model keep decision, and agreement with
    the rule-based teacher. Frozen weights are the production pattern
    (train offline, deploy weights) and make scoring one shuffle-free
    map stage of codegen'd expressions; they also make the query
    SQL-expressible, so unlike the train-at-query-time variant this
    carries an exact DuckDB oracle (bit-identical margin — see
    frozen_margin). The training path stays pinned by
    tests/test_classify.py."""
    from data_engineering_pipeline_spark.operators.classify import (
        featurize,
        frozen_margin,
    )

    docs = load_table(spark, sf_dir, "documents")
    feat = featurize(docs)
    z = frozen_margin()
    teacher = F.col("label") == 1.0
    return feat.select(
        "doc_id",
        teacher.alias("teacher_keep"),
        z.alias("margin"),
        (z > 0).alias("model_keep"),
        ((z > 0) == teacher).alias("agrees"),
    ).orderBy("doc_id")


_WS_RES = 1_000_000
# single-key portable hash (operators/sampling.py key_hash: h=0 then
# ((h + k) * 69069 + 1) % 2^32 per key), mirrored for doc_id
_WS_HASH_SQL = "(((doc_id) * 69069 + 1) % 4294967296)"


@_register(
    "curation-weighted-sample",
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
    ), q AS (
      SELECT doc_id,
        greatest(least(
          0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0)
          + 0.4 * diversity
          + 0.2 * least(stopword_ratio * 2.0, 1.0)
          - 0.2 * least(punct_ratio * 4.0, 1.0), 1.0), 0.0) AS quality
      FROM m
    )
    SELECT doc_id, quality
    FROM q
    WHERE CAST({_WS_HASH_SQL} % {_WS_RES} AS DOUBLE) / {_WS_RES}.0 < quality
    ORDER BY doc_id
    """,
)
def curation_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus subsample (operators/sampling.py
    weighted_sample): each document survives with probability equal to
    its deterministic quality score — soft quality filtering instead of
    a hard threshold. The per-row uniform comes from the portable
    exact-int64 key hash, so Spark and DuckDB keep the identical set."""
    from data_engineering_pipeline_spark.operators.sampling import (
        weighted_sample,
    )
    from data_engineering_pipeline_spark.operators.text import (
        quality_score,
        tokens,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        quality_score("text", toks=tokens("text")).alias("quality"),
    )
    return weighted_sample(scored, "quality", F.col("doc_id")).select(
        "doc_id", "quality"
    ).orderBy("doc_id")


@_register(
    "curation-temperature",
    """
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
               GROUP BY lang),
    p AS (SELECT lang, n_docs,
                 CAST(floor(sqrt(CAST(min(n_docs) OVER () AS DOUBLE)
                                 / n_docs) * 1000000.0) AS BIGINT)
                   AS keep_ppm
          FROM c),
    k AS (
      SELECT d.lang, count(*) AS n_kept
      FROM documents d JOIN p USING (lang)
      WHERE ((d.doc_id * 69069 + 1) % 4294967296) % 1000000 < p.keep_ppm
      GROUP BY d.lang
    )
    SELECT p.lang, CAST(p.n_docs AS BIGINT) AS n_docs, p.keep_ppm,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM p LEFT JOIN k ON k.lang = p.lang
    ORDER BY p.lang
    """,
)
def curation_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampling report at alpha=0.5 (operators/sampling.py
    temperature_rebalance): per-language input size, sqrt-law keep rate
    (ppm), surviving count. The sqrt is IEEE correctly-rounded so both
    engines floor the identical ppm; between curation-mixture
    (equalize, alpha=0) and no-op (alpha=1)."""
    from data_engineering_pipeline_spark.operators.sampling import (
        temperature_rebalance,
    )

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    mn = counts.agg(F.min("n_docs").alias("__min_n"))
    ppm = counts.join(F.broadcast(mn)).select(
        "lang",
        "n_docs",
        F.floor(
            F.sqrt(F.col("__min_n").cast("double") / F.col("n_docs"))
            * F.lit(1_000_000.0)
        ).cast("long").alias("keep_ppm"),
    )
    kept = (
        temperature_rebalance(docs, "lang", 0.5, F.col("doc_id"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__n_kept"))
    )
    return (
        ppm.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            "keep_ppm",
            F.coalesce("__n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
        .orderBy("lang")
    )


def _temp_alpha_oracle_sql() -> str:
    """Oracle for curation-temperature-alpha, assembled from the same
    dyadic decomposition the Spark side uses (sampling.dyadic_pow_sql —
    one source of truth for the factor order, so the two engines cannot
    drift). alpha=0.25 (exponent 0.75, dyadic) is graded hash-exact;
    alpha=0.3 (exponent 0.7, NOT dyadic) is graded through the
    deterministic dyadic bracket: each engine checks its OWN pow()
    against bit-identical dyadic bounds and emits a boolean."""
    from data_engineering_pipeline_spark.operators.sampling import (
        dyadic_bracket,
        dyadic_pow_sql,
    )

    ratio = "(CAST(min(n_docs) OVER () AS DOUBLE) / n_docs)"
    exact = dyadic_pow_sql(ratio, 0.75)
    lo_e, hi_e = dyadic_bracket(0.7)
    # larger exponent -> smaller value for ratio <= 1
    lo_val = dyadic_pow_sql(ratio, hi_e)
    hi_val = dyadic_pow_sql(ratio, lo_e)
    return f"""
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
               GROUP BY lang),
    p AS (SELECT lang, n_docs,
                 CAST(floor({exact} * 1000000.0) AS BIGINT) AS keep_ppm_q,
                 CAST(floor(pow({ratio}, 0.7) * 1000000.0) AS BIGINT)
                   AS pow_ppm,
                 CAST(floor({lo_val} * 1000000.0) AS BIGINT) AS lo_ppm,
                 CAST(floor({hi_val} * 1000000.0) AS BIGINT) AS hi_ppm
          FROM c),
    k AS (
      SELECT d.lang, count(*) AS n_kept_q
      FROM documents d JOIN p USING (lang)
      WHERE ((d.doc_id * 69069 + 1) % 4294967296) % 1000000 < p.keep_ppm_q
      GROUP BY d.lang
    )
    SELECT p.lang, CAST(p.n_docs AS BIGINT) AS n_docs, p.keep_ppm_q,
           CAST(coalesce(k.n_kept_q, 0) AS BIGINT) AS n_kept_q,
           (p.pow_ppm BETWEEN p.lo_ppm - 1 AND p.hi_ppm + 1)
             AS pow_in_bracket
    FROM p LEFT JOIN k ON k.lang = p.lang
    ORDER BY p.lang
    """


@_register("curation-temperature-alpha", None)
def curation_temperature_alpha(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature sampling graded BEYOND alpha=0.5 (VERDICT r5 item 6):
    the alpha=0.25 report is hash-exact because its exponent 0.75 is a
    dyadic rational computed as sqrt(x)*sqrt(sqrt(x)) — correctly
    rounded in both engines (operators/sampling.py dyadic_pow) — and
    the non-dyadic alpha=0.3 pow() path is graded by a deterministic
    bracket boolean: pow's ppm must land inside dyadic-exact bounds
    x^(180/256) .. x^(179/256) (±1 ppm floor slack). Any real bug —
    swapped alpha/1-alpha, inverted ratio, broken hash — flips the
    exact columns or the boolean; libm's few-ulp pow wobble cannot."""
    from data_engineering_pipeline_spark.operators.sampling import (
        dyadic_bracket,
        dyadic_pow,
        temperature_rebalance,
    )

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    mn = counts.agg(F.min("n_docs").alias("__min_n"))
    ratio = F.col("__min_n").cast("double") / F.col("n_docs").cast("double")
    lo_e, hi_e = dyadic_bracket(0.7)
    to_ppm = lambda c: F.floor(c * F.lit(1_000_000.0)).cast("long")  # noqa: E731
    ppm = counts.join(F.broadcast(mn)).select(
        "lang",
        "n_docs",
        to_ppm(dyadic_pow(ratio, 0.75)).alias("keep_ppm_q"),
        to_ppm(F.pow(ratio, F.lit(0.7))).alias("__pow_ppm"),
        # larger exponent -> smaller value for ratio <= 1
        to_ppm(dyadic_pow(ratio, hi_e)).alias("__lo_ppm"),
        to_ppm(dyadic_pow(ratio, lo_e)).alias("__hi_ppm"),
    )
    kept = (
        temperature_rebalance(docs, "lang", 0.25, F.col("doc_id"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("__n_kept"))
    )
    return (
        ppm.join(kept, "lang", "left")
        .select(
            "lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            "keep_ppm_q",
            F.coalesce("__n_kept", F.lit(0)).cast("long").alias("n_kept_q"),
            F.col("__pow_ppm").between(
                F.col("__lo_ppm") - 1, F.col("__hi_ppm") + 1
            ).alias("pow_in_bracket"),
        )
        .orderBy("lang")
    )


ORACLES["curation-temperature-alpha"] = _temp_alpha_oracle_sql()


@_register(
    "curation-shards",
    """
    WITH h0 AS (
      SELECT doc_id, n_chars,
             ((1 + doc_id) * 69069 + 1) % 4294967296 AS hk
      FROM documents
    ), hr AS (
      SELECT doc_id, n_chars,
             hk % 1000000007 AS h1, hk % 999999937 AS h2
      FROM h0
    ), r1 AS (
      SELECT doc_id, n_chars,
             (h1 * h1 + 48271 * h1 + h2) % 1000000007 AS g1,
             (h2 * h2 + 69621 * h2 + h1) % 999999937 AS g2
      FROM hr
    ), hu AS (
      SELECT doc_id, n_chars,
             (g1 * g1 + 48271 * g1 + g2) % 1000000007 * 999999937
             + (g2 * g2 + 69621 * g2 + g1) % 999999937 AS u
      FROM r1
    ), r AS (
      SELECT CAST(u % 8 AS BIGINT) AS shard, doc_id,
             row_number() OVER (PARTITION BY u % 8
                                ORDER BY u, doc_id) AS pos,
             count(*) OVER (PARTITION BY u % 8) AS n_docs,
             sum(n_chars) OVER (PARTITION BY u % 8) AS sum_chars
      FROM hu
    )
    SELECT shard, CAST(pos AS BIGINT) AS pos, doc_id,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(sum_chars AS BIGINT) AS sum_chars
    FROM r WHERE pos <= 3
    ORDER BY shard, pos
    """,
)
def curation_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-shard export
    (operators/sharding.py): shard assignment and within-shard order
    are pure functions of (epoch, doc_id), so the oracle reproduces
    the exact layout — head rows of each shard prove the ORDER, the
    per-shard counts prove assignment and balance. The hash is
    mixed_key_hash (r10): the LCG fold (epoch 0: seed = 1) then the
    sketches' two-round quadratic cross-mix, so within-shard order is
    a genuine permutation of contiguous ids, not ID order."""
    from pyspark.sql import Window

    from data_engineering_pipeline_spark.operators.sharding import (
        shard_manifest,
    )

    docs = load_table(spark, sf_dir, "documents")
    mf = shard_manifest(docs, 8, F.col("doc_id"))
    return (
        mf.withColumn(
            "sum_chars",
            F.sum("n_chars").over(Window.partitionBy("shard")),
        )
        .filter(F.col("pos") <= 3)
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("pos").cast("long").alias("pos"),
            "doc_id",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("sum_chars").cast("long").alias("sum_chars"),
        )
        .orderBy("shard", "pos")
    )


# curation-boilerplate: the fixture corpus has no newlines, so both
# engines first insert one after every 8th token (identical leftmost-
# first regex partition of space-separated text) — the operator itself
# is line-based over real corpora.
_BP_SEG_RE = r"((?:\S+\s+){8})"
_BP_MIN_DOCS = 2

@_register(
    "curation-boilerplate",
    f"""
    WITH a AS (
      SELECT doc_id,
             regexp_replace(text, '{_BP_SEG_RE}', '\\1' || chr(10), 'g')
               AS aug
      FROM documents
    ), s0 AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(aug, chr(10)),
                                        x -> trim(x)), x -> x <> '')
               AS segs
      FROM a
    ), ex AS (
      SELECT doc_id, unnest(segs) AS seg,
             unnest(generate_series(1, len(segs))) - 1 AS pos
      FROM s0
    ), k AS (
      SELECT doc_id, pos, seg, lower(seg) AS kk FROM ex
    ), dfq AS (
      SELECT kk, count(DISTINCT doc_id) AS nd FROM k GROUP BY kk
    ), m AS (
      SELECT k.doc_id, k.pos, k.seg,
             (dfq.nd >= {_BP_MIN_DOCS}) AS is_boiler
      FROM k JOIN dfq USING (kk)
    ), r AS (
      SELECT doc_id, count(*) AS n_segments,
             sum(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS n_boiler,
             coalesce(string_agg(
               CASE WHEN NOT is_boiler THEN seg END,
               chr(10) ORDER BY pos), '') AS clean_text
      FROM m GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(r.n_segments, 0) AS BIGINT) AS n_segments,
           CAST(coalesce(r.n_boiler, 0) AS BIGINT) AS n_boiler,
           coalesce(r.clean_text, '') AS clean_text
    FROM documents d LEFT JOIN r ON r.doc_id = d.doc_id
    ORDER BY d.doc_id
    """,
)
def curation_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-frequency boilerplate line removal (RefinedWeb /
    Gopher-style, operators/dedup.py boilerplate_segments): a line
    whose lowercased form appears in >= 2 distinct documents is dropped
    from EVERY document — the frequency-based complement of
    curation-chunk-dedup's keep-first rule. Graded end to end: per-doc
    segment counts, boilerplate counts, and the exact rebuilt text."""
    from data_engineering_pipeline_spark.operators.dedup import (
        boilerplate_segments,
    )

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.regexp_replace(F.col("text"), _BP_SEG_RE, "$1\n")
    )
    return boilerplate_segments(
        docs, "doc_id", "text", min_docs=_BP_MIN_DOCS
    ).orderBy("doc_id")


_DSIR_K = 100
_DSIR_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(string_split(bg, ''),"
    " c -> CAST(ascii(c) AS BIGINT))),"
    " (acc, c) -> (acc * 31 + c) % 1000000007)"
    " * 2147483648"
    " + list_reduce(list_prepend(CAST(0 AS BIGINT),"
    " list_transform(string_split(bg, ''),"
    " c -> CAST(ascii(c) AS BIGINT))),"
    " (acc, c) -> (acc * 131 + c) % 999999937)"
)

@_register(
    "curation-dsir",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i+1]))
               AS bg
      FROM t WHERE len(toks) >= 2
    ), b AS (
      SELECT doc_id, ({_DSIR_HASH}) % 512 AS bucket FROM bg
    ), s AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum((bucket * 2654435761 + 40503) % 4001 - 2000)
                  AS BIGINT) AS score
      FROM b GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, score, score / n_bigrams AS score_norm
    FROM s
    ORDER BY score_norm DESC, doc_id
    LIMIT {_DSIR_K}
    """,
)
def curation_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023,
    operators/classify.py dsir_scores): hashed-bigram importance
    scores from a frozen quantized log-ratio table (the offline
    fit_dsir_logratios path is unit-tested), temperature-0 top-100
    selection via TakeOrderedAndProject. Scoring is one map stage —
    exact int64 arithmetic end to end, so the oracle reproduces every
    score bit for bit."""
    from data_engineering_pipeline_spark.operators.classify import (
        dsir_scores,
        dsir_select_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    return dsir_select_topk(dsir_scores(docs, dedup_hash=True), _DSIR_K)


_SPLIT_ORACLE = """
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
    ), comp AS (
      SELECT v AS doc_id, min(l) AS component FROM walk GROUP BY v
    ), h0 AS (
      SELECT doc_id, component,
             component % 1000000007 AS h1,
             component % 999999937 AS h2
      FROM comp
    ), r1 AS (
      SELECT doc_id, component,
             (h1 * h1 + 48271 * h1 + h2) % 1000000007 AS g1,
             (h2 * h2 + 69621 * h2 + h1) % 999999937 AS g2
      FROM h0
    ), bkt AS (
      SELECT doc_id, component,
             ((g1 * g1 + 48271 * g1 + g2) % 1000000007 * 999999937
              + (g2 * g2 + 69621 * g2 + g1) % 999999937) % 100 AS bucket
      FROM r1
    )
    SELECT doc_id, component, CAST(bucket AS BIGINT) AS bucket,
           CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM bkt ORDER BY doc_id
"""


_PPL_GATE_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(toks[1:len(toks)-1]) AS w1,
             unnest(toks[2:len(toks)]) AS w2
      FROM t WHERE len(toks) >= 2
    ),
    ctx AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
    types AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
    n1f AS (SELECT w1, count(*) AS nf FROM types GROUP BY w1),
    n1b AS (SELECT w2, count(*) AS nb2 FROM types GROUP BY w2),
    nbt AS (SELECT CAST(count(*) AS DOUBLE) AS nb FROM types),
    lq AS (
      SELECT ty.w1, ty.w2,
             CAST(floor(ln(
               (CAST(ty.c12 AS DOUBLE) - 0.75) / CAST(x.c1 AS DOUBLE)
               + (0.75 * CAST(f.nf AS DOUBLE) / CAST(x.c1 AS DOUBLE))
                 * (CAST(b.nb2 AS DOUBLE) / o.nb)
             ) * 1000000000 + 0.5) AS BIGINT) AS lq
      FROM types ty
      JOIN ctx x ON ty.w1 = x.w1
      JOIN n1f f ON ty.w1 = f.w1
      JOIN n1b b ON ty.w2 = b.w2
      CROSS JOIN nbt o
    ),
    d AS (
      SELECT bg.doc_id, count(*) AS n, CAST(sum(lq.lq) AS BIGINT) AS s
      FROM bg JOIN lq ON bg.w1 = lq.w1 AND bg.w2 = lq.w2
      GROUP BY bg.doc_id
    ),
    scored AS (
      SELECT doc_id, CAST(-s AS DOUBLE) / n / 1000000000.0 AS kn_ce
      FROM d
    ),
    bkt AS (
      SELECT doc_id,
             CAST(ntile(3) OVER (ORDER BY kn_ce, doc_id) AS BIGINT)
               AS ppl_bucket
      FROM scored
    ),
    g AS (
      SELECT doc_id, ppl_bucket,
             CASE WHEN ppl_bucket = 1 THEN 1000000
                  WHEN ppl_bucket = 2 THEN 500000
                  ELSE 250000 END AS keep_ppm,
             (((((doc_id * 69069 + 1) % 4294967296) + 1) * 69069 + 1)
               % 4294967296) % 1000000 AS h
      FROM bkt
    )
    SELECT ppl_bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE h < keep_ppm) AS BIGINT)
             AS n_kept,
           CAST(sum(doc_id) FILTER (WHERE h < keep_ppm) AS BIGINT)
             AS kept_id_sum
    FROM g GROUP BY ppl_bucket ORDER BY ppl_bucket
    """


@_register("curation-ppl-gate", _PPL_GATE_ORACLE)
def curation_ppl_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity gate (Wenzek et al. 2020; operators/lm.py
    + plans/curation_pipeline.py ppl_gate stage): score every document
    with the Kneser-Ney bigram LM trained on the corpus itself, bucket
    into terciles by cross-entropy, then keep head docs entirely and
    DOWNSAMPLE the middle/tail buckets deterministically (50% / 25% by
    a SALTED integer key hash — independent of the temperature stage's
    unsalted deviate, so composed rates multiply) — the corpus-mix
    shape a perplexity filter actually produces. The oracle
    replays the whole chain (LM, terciles, hash gate) in pure SQL, so
    a drifted LM expression, a wrong bucket boundary, or a biased
    keep-hash all surface as value mismatches. Scale: LM training =
    three keys-only groupBys; the gate is one map expression."""
    from pyspark.sql import Window

    from data_engineering_pipeline_spark.operators.lm import (
        bigram_explode,
        kn_doc_ce,
        kn_train,
    )
    from data_engineering_pipeline_spark.operators.sampling import (
        key_hash,
    )

    from data_engineering_pipeline_spark.operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    # tokenize ONCE across kn_train's stat branches + the scoring join
    # (lazy map-only checkpoint; the kn3/bigram-ppl r13 finding)
    toked = docs.select(
        "doc_id", tokens("text").alias("__toks")
    ).localCheckpoint(eager=False)
    bg = bigram_explode(toked, toks_col="__toks")
    scored = kn_doc_ce(bg, kn_train(bg)["lq"])
    w = Window.orderBy("kn_ce", "doc_id")
    bkt = scored.withColumn(
        "ppl_bucket", F.ntile(3).over(w).cast("long")
    )
    keep_ppm = (
        F.when(F.col("ppl_bucket") == 1, F.lit(1_000_000))
        .when(F.col("ppl_bucket") == 2, F.lit(500_000))
        .otherwise(F.lit(250_000))
    )
    # salted deviate (doc_id, 1): independent of the unsalted hash the
    # temperature stage draws, so composing gate + rates in the
    # pipeline keeps the PRODUCT of the rates (plans/curation_pipeline)
    kept = key_hash(F.col("doc_id"), F.lit(1)) % 1_000_000 < keep_ppm
    return (
        bkt.withColumn("__kept", kept)
        .groupBy("ppl_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("__kept").cast("long")).alias("n_kept"),
            F.sum(F.when(F.col("__kept"), F.col("doc_id"))).alias(
                "kept_id_sum"
            ),
        )
        .orderBy("ppl_bucket")
    )


@_register("curation-split-leakage", _SPLIT_ORACLE)
def curation_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split (operators/sampling.py
    leakage_safe_split): near-duplicate components are assigned to
    splits AS A UNIT, so no duplicate pair can straddle the
    train/eval boundary — the structural fix for the eval-
    contamination bug a per-document split always has. The pair graph
    is the graded MinHash-LSH banding (provably equal to the exact
    pairs at the 0.7 threshold, as dedup-keep-best); the oracle
    recomputes the exact transitive closure via WITH RECURSIVE and
    the same two-round quadratic bucket hash in pure int64 — every
    row bit-exact. Scale: components shuffle the pair graph only;
    the split is one map expression; assignment is stable across
    runs, engines, and corpus growth."""
    from data_engineering_pipeline_spark.operators.sampling import (
        leakage_safe_split,
    )
    from data_engineering_pipeline_spark.queries.dedup import (
        JACCARD_THRESHOLD,
        minhash_lsh_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", JACCARD_THRESHOLD, bands=16
    ).select("id_a", "id_b")
    return leakage_safe_split(docs.select("doc_id"), pairs).orderBy(
        "doc_id"
    )


def _decon_mix_oracle() -> str:
    from data_engineering_pipeline_spark.queries.dedup import (
        _porthash_sql,
    )

    return f"""
    WITH t AS (
      SELECT doc_id, lang, source, {_TOKS} AS toks FROM documents
    ), sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               generate_series(1, len(toks) - 2),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
               AS shingles
      FROM t WHERE len(toks) >= 3
    ), evh AS (
      SELECT DISTINCT {_porthash_sql('shingle')} AS h FROM (
        SELECT unnest(shingles) AS shingle FROM sh
        WHERE TRY_CAST(substr(source, 4) AS INTEGER) >= 10)
    ), csh AS (
      SELECT doc_id, {_porthash_sql('shingle')} AS h FROM (
        SELECT doc_id, unnest(shingles) AS shingle FROM sh
        WHERE TRY_CAST(substr(source, 4) AS INTEGER) < 10)
    ), contam AS (
      SELECT DISTINCT c.doc_id FROM csh c JOIN evh ON evh.h = c.h
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE doc_id NOT IN
                 (SELECT doc_id FROM contam)) AS BIGINT) AS n_kept,
           sum(doc_id) FILTER (WHERE doc_id NOT IN
                 (SELECT doc_id FROM contam)) AS kept_id_sum
    FROM t WHERE TRY_CAST(substr(source, 4) AS INTEGER) < 10
    GROUP BY lang ORDER BY lang
    """


@_register("curation-decon-mix", _decon_mix_oracle())
def curation_decon_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination as the curation pipeline runs it
    (plans/curation_pipeline.py _freeze_decon/_apply_decon): sources
    src10+ play the held-out eval set, src0-9 the training corpus.
    The rebuild-time freeze persists the eval shingle-hash set plus
    its Bloom bit-words; the corpus is screened by the broadcast
    Bloom (no false negatives) with exact verification on bloom hits
    only, and docs sharing ANY eval shingle are dropped. Because the
    exact verifier sits behind the screen, the RESULT equals pure
    exact filtering — the oracle replays it as a hash-join in SQL,
    while the Spark side exercises the production bloom+verify path.
    Output: the decontaminated corpus mix per lang. Scale: the
    filter is eval-sized (kilobytes broadcast); the corpus side is
    one map probe; only bloom-positive shingles reach the verifier
    join (the 100 TB shape, measured in BASELINE.md)."""

    from data_engineering_pipeline_spark.plans.curation_pipeline import (
        _apply_decon,
        _freeze_decon,
    )

    docs = load_table(spark, sf_dir, "documents")
    srcnum = F.substring("source", 4, 10).try_cast("int")
    corpus = docs.filter(srcnum < 10)
    ev = docs.filter(srcnum >= 10).select("text")
    d = fresh_tmpdir("decon_q_")
    _freeze_decon(spark, ev, d)
    kept = _apply_decon(spark, corpus, d, 0).select("doc_id").withColumn(
        "__k", F.lit(1)
    )
    return (
        corpus.select("doc_id", "lang")
        .join(kept, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("__k").alias("n_kept"),
            F.sum(F.when(F.col("__k") == 1, F.col("doc_id"))).alias(
                "kept_id_sum"
            ),
        )
        .orderBy("lang")
    )


_CURR_WEIGHTS = {"en": 3, "de": 2, "fr": 1}
_CURR_W_TOTAL = 6  # sum of weights; cycle width

@_register(
    "curation-curriculum",
    f"""
    WITH k AS (
      SELECT doc_id, lang,
             ((1 + doc_id) * 69069 + 1) % 4294967296 AS hk
      FROM documents WHERE lang IN ('de', 'en', 'fr')
    ), kr AS (
      SELECT doc_id, lang,
             hk % 1000000007 AS h1, hk % 999999937 AS h2
      FROM k
    ), k1 AS (
      SELECT doc_id, lang,
             (h1 * h1 + 48271 * h1 + h2) % 1000000007 AS g1,
             (h2 * h2 + 69621 * h2 + h1) % 999999937 AS g2
      FROM kr
    ), ku AS (
      SELECT doc_id, lang,
             (g1 * g1 + 48271 * g1 + g2) % 1000000007 * 999999937
             + (g2 * g2 + 69621 * g2 + g1) % 999999937 AS u
      FROM k1
    ), r AS (
      SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
                                     ORDER BY u, doc_id) - 1
                  AS BIGINT) AS r
      FROM ku
    ), m AS (
      SELECT doc_id, lang, r,
             CASE lang WHEN 'de' THEN 2 WHEN 'en' THEN 3
                       ELSE 1 END AS w,
             CASE lang WHEN 'de' THEN 0 WHEN 'en' THEN 2
                       ELSE 5 END AS o
      FROM r
    )
    SELECT CAST((r // w) * {_CURR_W_TOTAL} + o + (r % w) AS BIGINT)
             AS pos,
           doc_id, lang
    FROM m ORDER BY pos
    """,
)
def curation_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order curriculum (operators/sharding.py
    curriculum_interleave): the curated corpus is scheduled as an
    exact 3:2:1 en:de:fr weighted round-robin — every 6-position
    cycle carries the target mixture, not just the corpus in
    expectation — with within-domain order from the epoch-keyed hash
    (epoch 0 here). Pure int64 position arithmetic, so the oracle
    replays the entire schedule; domains outside the spec are
    dropped (the target_mixture_rebalance contract)."""
    from data_engineering_pipeline_spark.operators.sharding import (
        curriculum_interleave,
    )

    docs = load_table(spark, sf_dir, "documents")
    return (
        curriculum_interleave(docs, "lang", _CURR_WEIGHTS, F.col("doc_id"))
        .select("pos", "doc_id", "lang")
        .orderBy("pos")
    )


_SPAN_N = 3

def _decon_spans_oracle() -> str:
    from data_engineering_pipeline_spark.queries.dedup import (
        _porthash_sql,
    )

    n = _SPAN_N
    return f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKS} AS toks FROM documents
    ), ev AS (
      SELECT DISTINCT {_porthash_sql('gram')} AS g FROM (
        SELECT unnest(list_transform(
                 generate_series(1, len(toks) - {n - 1}),
                 i -> array_to_string(toks[i : i + {n - 1}], ' ')))
               AS gram
        FROM t WHERE TRY_CAST(substr(source, 4) AS INTEGER) >= 10
          AND len(toks) >= {n})
    ), c AS (
      SELECT doc_id, toks, len(toks) AS n_tokens FROM t
      WHERE TRY_CAST(substr(source, 4) AS INTEGER) < 10
    ), wins AS (
      SELECT doc_id, i - 1 AS pos,
             {_porthash_sql(
                 f"array_to_string(toks[i : i + {n - 1}], ' ')")} AS g
      FROM c, unnest(generate_series(1, len(toks) - {n - 1})) AS u(i)
      WHERE len(toks) >= {n}
    ), hits AS (
      SELECT w.doc_id, w.pos FROM wins w JOIN ev ON ev.g = w.g
    ), cov AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_contam_windows,
             list_sort(list_distinct(flatten(list(
               list_transform(generate_series(0, {n - 1}),
                              k -> pos + k))))) AS cv
      FROM hits GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(c.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(v.n_contam_windows, 0) AS BIGINT)
             AS n_contam_windows,
           CAST(coalesce(len(v.cv), 0) AS BIGINT) AS removed_tokens,
           coalesce(array_to_string(list_filter(
             list_transform(c.toks,
               (x, i) -> CASE WHEN NOT list_contains(
                                coalesce(v.cv, []), i - 1)
                              THEN x END),
             x -> x IS NOT NULL), ' '), '') AS clean_text
    FROM c LEFT JOIN cov v ON v.doc_id = c.doc_id
    ORDER BY c.doc_id
    """


@_register("curation-decon-spans", _decon_spans_oracle())
def curation_decon_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-LEVEL decontamination (operators/dedup.py
    decontaminate_spans): instead of dropping every corpus document
    that shares an n-gram with the eval set (curation-decon-mix's
    policy), the contaminated token WINDOWS are cut out and the
    document keeps its clean remainder — the surgical treatment for
    long documents tainted by one boilerplate sentence. Sources
    src10+ play the eval set, src0-9 the corpus (same cast as the
    decon-mix query). Graded over the portable token hash so the
    oracle replays the exact gram grouping; xxhash64 is the scale
    default. Scale: the eval gram set broadcasts; the corpus pays one
    windows explode + one doc_id groupBy; clean text is sliced with
    an indexed transform (no second explode)."""
    from data_engineering_pipeline_spark.operators.dedup import (
        decontaminate_spans,
        portable_token_hash,
    )

    docs = load_table(spark, sf_dir, "documents")
    srcnum = F.substring("source", 4, 10).try_cast("int")
    corpus = docs.filter(srcnum < 10)
    ev = docs.filter(srcnum >= 10)
    return decontaminate_spans(
        corpus, ev, n=_SPAN_N, gram_hash=portable_token_hash
    ).orderBy("doc_id")
