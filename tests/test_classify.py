"""Distilled quality classifier: the MLlib LR must reproduce its
rule-based teacher (high AUC + agreement) and train deterministically
regardless of input partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.classify import (
    featurize,
    score_quality,
    train_quality_model,
)
from data_engineering_pipeline_spark.sources import load_table


def test_distilled_model_reproduces_teacher(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    feat = featurize(docs)
    labels = {r["doc_id"]: r["label"] for r in feat.collect()}
    assert 0 < sum(labels.values()) < len(labels)  # both classes present

    model = train_quality_model(feat)
    scored = score_quality(model, feat).join(
        feat.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()

    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    auc_df = model.transform(feat)
    auc = BinaryClassificationEvaluator(labelCol="label").evaluate(auc_df)
    agree = sum(
        1 for r in rows if (r["model_keep"] is True) == (r["label"] == 1.0)
    ) / len(rows)
    assert auc > 0.95
    assert agree > 0.85


def test_training_partitioning_invariant(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    feat = featurize(docs)
    m1 = train_quality_model(feat)
    m2 = train_quality_model(feat.repartition(13))
    c1 = m1.stages[-1].coefficients.toArray()
    c2 = m2.stages[-1].coefficients.toArray()
    # L-BFGS on the same data converges to the same optimum; tolerance
    # covers summation-order float noise across partitionings
    assert max(abs(c1 - c2)) < 1e-4


def test_scoring_is_probability(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    feat = featurize(docs)
    model = train_quality_model(feat)
    rows = score_quality(model, feat).collect()
    assert len(rows) == docs.count()
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)
    # high-probability docs should overwhelmingly be teacher-keeps
    top = (
        score_quality(model, feat)
        .join(feat.select("doc_id", "label"), "doc_id")
        .orderBy(F.desc("quality_prob"))
        .limit(20)
        .collect()
    )
    assert sum(r["label"] for r in top) >= 18
