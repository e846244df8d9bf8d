"""Kneser-Ney bigram language model as a REUSABLE operator pair:
train (type-level quantized log-probs + backoff tables) and score
(per-doc integer cross-entropy, with continuation backoff for bigrams
the training corpus never saw). This is the CCNet-style perplexity
filter (Wenzek et al. 2020) the curation pipeline's quality gate uses:
train on the corpus at rebuild time, freeze the model next to the
frozen temperature rates, score later increments against the frozen
model.

The expression tree is the exact one the graded text-kneser-ney-ppl
query ships (queries/text.py — Kneser & Ney 1995; Chen & Goodman 1998;
D = 0.75, one quantized ln per bigram TYPE, exact int64 doc sums), so
DuckDB oracles replay it term for term.

Scale shape: training is three partial-agg groupBys over bigram
occurrences (keys-only shuffles); the model is O(bigram types) — the
same footprint CCNet ships as its KenLM binaries. Scoring joins docs'
bigrams to the type table: broadcast when the model is small, plain
(w1, w2) equi-join at corpus scale. The frozen tables are parquet, so
a 100 TB deployment reads them as ordinary broadcast/shuffle sides."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# quantization scale for log-probabilities (milli-nano-log units):
# ln(p) * 1e9 rounded half-up — matches the graded KN queries
_Q = 1_000_000_000


def bigram_explode(docs: DataFrame, id_col: str = "doc_id",
                   toks_col: str | None = None,
                   text_col: str = "text") -> DataFrame:
    """(id, w1, w2) bigram occurrences via the sequence/transform idiom
    (O(n) per doc, no re-tokenization inside the lambda)."""
    from data_engineering_pipeline_spark.operators.text import tokens

    toked = (
        docs.select(id_col, F.col(toks_col).alias("__toks"))
        if toks_col is not None
        else docs.select(id_col, tokens(text_col).alias("__toks"))
    ).filter(F.size("__toks") >= 2)
    return toked.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(1, size(__toks) - 1), "
                "i -> struct(element_at(__toks, i) AS w1, "
                "element_at(__toks, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select(id_col, "b.w1", "b.w2")


def kn_train(bg: DataFrame,
             broadcast_model: bool = True) -> dict[str, DataFrame]:
    """Train the interpolated KN bigram model on bigram occurrences:

        p(w2|w1) = (c12 - D)/c1 + (D * N1+(w1,.)/c1) * N1+(.,w2)/NB

    Returns the frozen-model frames:
      lq   (w1, w2, lq)  quantized ln p for every SEEN bigram type
      ctx  (w1, c1, nf)  context count + distinct-follower count
      cont (w2, nb2)     continuation count (distinct predecessors)
      nb   (nb)          one row: total bigram types, double

    broadcast_model=False (ADVICE r8): the ctx/n1f/n1b sides are
    vocabulary-sized; on a corpus whose vocabulary outgrows the
    driver/broadcast limit, fall back to plain (w1)/(w2) equi-joins —
    the same escape hatch the scorers (kn_doc_ce/kn_doc_ce_backoff)
    already expose. The 1-row nb total stays broadcast always."""
    hint = F.broadcast if broadcast_model else (lambda df: df)
    ctx = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    types = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    n1f = types.groupBy("w1").agg(F.count(F.lit(1)).alias("nf"))
    n1b = types.groupBy("w2").agg(F.count(F.lit(1)).alias("nb2"))
    nbt = types.agg(F.count(F.lit(1)).cast("double").alias("nb"))
    lq = (
        types.join(hint(ctx), "w1")
        .join(hint(n1f), "w1")
        .join(hint(n1b), "w2")
        .join(F.broadcast(nbt))
        .select(
            "w1",
            "w2",
            F.floor(
                F.log(
                    (F.col("c12").cast("double") - F.lit(0.75))
                    / F.col("c1").cast("double")
                    + (
                        F.lit(0.75)
                        * F.col("nf").cast("double")
                        / F.col("c1").cast("double")
                    )
                    * (F.col("nb2").cast("double") / F.col("nb"))
                )
                * _Q
                + F.lit(0.5)
            ).alias("lq"),
        )
    )
    return {
        "lq": lq,
        "ctx": ctx.join(F.broadcast(n1f), "w1"),
        "cont": n1b,
        "nb": nbt,
    }


def kn_doc_ce(bg: DataFrame, lq: DataFrame, id_col: str = "doc_id",
              broadcast_model: bool = True) -> DataFrame:
    """Per-doc cross-entropy over SEEN bigrams (the in-corpus scoring
    shape the graded queries use): (id, n_bigrams, kn_ce). Exact int64
    sum of the quantized type log-probs, divided once at the end."""
    model = F.broadcast(lq) if broadcast_model else lq
    d = (
        bg.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("lq").alias("s"))
    )
    return d.select(
        id_col,
        F.col("n").cast("long").alias("n_bigrams"),
        ((-F.col("s")).cast("double") / F.col("n") / F.lit(float(_Q)))
        .alias("kn_ce"),
    )


def kn_doc_ce_backoff(bg: DataFrame, model: dict[str, DataFrame],
                      id_col: str = "doc_id",
                      broadcast_model: bool = True) -> DataFrame:
    """Per-doc cross-entropy against a FROZEN model — the delta-mode
    scorer: bigrams unseen at training time take the continuation
    backoff term (c12 = 0 drops the discounted first term), and
    bigrams whose context or continuation is entirely out-of-vocab
    take the uniform floor ln(1/NB). Deterministic given the frozen
    tables, so increments score reproducibly until the next rebuild
    retrains. Returns (id, n_bigrams, ce_q) with ce_q the quantized
    integer mean (floor of -mean(lq)) — comparable against frozen
    integer cutoffs without float drift."""
    hint = F.broadcast if broadcast_model else (lambda df: df)
    joined = (
        bg.join(hint(model["lq"]), ["w1", "w2"], "left")
        .join(hint(model["ctx"]), "w1", "left")
        .join(hint(model["cont"]), "w2", "left")
        .join(hint(model["nb"]))
    )
    backoff = F.floor(
        F.log(
            (
                F.lit(0.75)
                * F.col("nf").cast("double")
                / F.col("c1").cast("double")
            )
            * (F.col("nb2").cast("double") / F.col("nb"))
        )
        * _Q
        + F.lit(0.5)
    )
    oov = F.floor(F.log(F.lit(1.0) / F.col("nb")) * _Q + F.lit(0.5))
    scored = joined.select(
        id_col,
        F.coalesce(
            F.col("lq"),
            F.when(
                F.col("c1").isNotNull() & F.col("nb2").isNotNull(),
                backoff,
            ),
            oov,
        ).alias("__lq"),
    )
    d = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum("__lq").alias("s")
    )
    return d.select(
        id_col,
        F.col("n").cast("long").alias("n_bigrams"),
        F.floor(
            (-F.col("s")).cast("double") / F.col("n")
        ).cast("long").alias("ce_q"),
    )
