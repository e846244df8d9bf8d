"""Model-based document quality filtering (Spark MLlib).

The production pattern behind "quality classifier" corpus filters
(GPT-3/LLaMA-style: score every document with a cheap linear model,
keep the high-scoring tail): featurize per-row text statistics, train a
logistic regression, score the corpus distributively. With no human
labels in this sandbox, the classifier is DISTILLED from the
rule-based Gopher filter (train on the rules' keep/drop labels) — the
bootstrap every real pipeline uses before it has curated labels; swap
`label_col` for human labels and nothing else changes.

Scale: featurization is per-row map work (the same whole-stage-codegen
expressions as text-filter); LR training is MLlib's distributed L-BFGS
over the feature matrix (a handful of passes); scoring is one broadcast
of the coefficient vector — no shuffle. The model is tiny (7 floats).

No SQL oracle (model weights are not SQL-expressible) — this stays off
the graded registry; tests/test_classify.py asserts the distilled model
reproduces the teacher rules (AUC + agreement) and that training is
deterministic under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.text import (
    STOPWORDS_EN,
    distinct_token_count,
    mean_token_length,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
)

FEATURES = [
    "n_tokens",
    "mean_token_len",
    "diversity",
    "stopword_ratio",
    "punct_ratio",
    "top_token_ratio",
    # band-distance features: the teacher's BETWEEN rules are not
    # linearly separable in the raw metrics; distance-from-band-center
    # makes each band a single one-sided threshold the LR can express
    "len_band_dev",
    "mtl_band_dev",
]


def featurize(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc numeric features (one tokenization pass, map-only) plus
    the rule-based teacher label from the Gopher-style filter."""
    toked = docs.select(
        F.col(id_col), F.col(text_col), tokens(text_col).alias("__toks")
    )
    t = F.col("__toks")
    top_freq = F.array_max(
        F.transform(
            F.array_distinct(t),
            lambda d: F.size(F.filter(t, lambda x: x == d)),
        )
    )
    # Zero-token (or empty-text) docs would otherwise emit NaN ratios
    # (0.0/0 is IEEE NaN even under ANSI) and a null top_token_ratio
    # (array_max over an empty array) — NaN silently poisons the LR fit
    # and null makes VectorAssembler(handleInvalid='error') throw. Such
    # docs carry no signal in the x/0 features, so they get 0.0 and the
    # n_tokens band (and teacher rule) does the rejecting.
    nt = token_count(toks=t)

    def _safe(ratio: Column) -> Column:
        return F.when(nt > 0, ratio).otherwise(F.lit(0.0))

    m = toked.select(
        F.col(id_col),
        nt.cast("double").alias("n_tokens"),
        _safe(mean_token_length(toks=t)).alias("mean_token_len"),
        _safe(
            distinct_token_count(toks=t).cast("double") / token_count(toks=t)
        ).alias("diversity"),
        _safe(stopword_ratio(toks=t, stopwords=STOPWORDS_EN)).alias(
            "stopword_ratio"
        ),
        F.size(
            F.filter(
                t,
                lambda x: F.array_contains(
                    F.array(*[F.lit(s) for s in STOPWORDS_EN]), x
                ),
            )
        ).alias("__n_stopwords"),
        F.when(F.length(text_col) > 0, punct_ratio(text_col))
        .otherwise(F.lit(0.0))
        .alias("punct_ratio"),
        _safe(top_freq.cast("double") / token_count(toks=t)).alias(
            "top_token_ratio"
        ),
    ).select(
        "*",
        F.abs(F.col("n_tokens") - 57.5).alias("len_band_dev"),
        F.abs(F.col("mean_token_len") - 4.5).alias("mtl_band_dev"),
    )
    # the stopword rule compares the INTEGER count (as text-filter
    # does) — reconstructing it as ratio*n_tokens re-rounds through a
    # float and disagrees at boundary docs (e.g. 2/49*49 < 2)
    keep = (
        F.col("n_tokens").between(25, 90)
        & (F.col("mean_token_len") >= 4.0)
        & (F.col("mean_token_len") <= 5.0)
        & (F.col("__n_stopwords") >= 2)
        & (F.col("diversity") >= 0.4)
        & (F.col("top_token_ratio") <= 0.1)
    )
    return m.withColumn("label", keep.cast("double")).drop("__n_stopwords")


def train_quality_model(feat: DataFrame):
    """Fit the distilled LR on a featurize() frame. Returns the fitted
    PipelineModel (assembler + scaler + LR).

    The freshly-fit LogisticRegressionModel carries a trainingSummary
    that holds the SparkSession; when the scoring closure is java-
    serialized (e.g. the scored frame lands on a broadcast build side)
    that drags the session's non-serializable ObservationManager along
    and the job dies with NotSerializableException. A save/load
    round-trip returns the same model minus the summary — the standard
    way to make a fitted model closure-safe."""
    import shutil
    import tempfile

    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURES, outputCol="__raw"),
            StandardScaler(inputCol="__raw", outputCol="__feat"),
            LogisticRegression(
                featuresCol="__feat",
                labelCol="label",
                maxIter=50,
                regParam=1e-3,
            ),
        ]
    )
    model = pipe.fit(feat)
    d = tempfile.mkdtemp(prefix="quality_model_")
    try:
        model.write().overwrite().save(d)
        return PipelineModel.load(d)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def score_quality(model, feat: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, quality_prob, model_keep) for every row — the corpus-wide
    scoring pass; the model broadcast is a few floats."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(feat)
    return scored.select(
        F.col(id_col),
        vector_to_array("probability").getItem(1).alias("quality_prob"),
        (F.col("prediction") == 1.0).alias("model_keep"),
    )
