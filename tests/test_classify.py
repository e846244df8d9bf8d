"""Distilled quality classifier: the MLlib LR must reproduce its
rule-based teacher (high AUC + agreement) and train deterministically
regardless of input partitioning."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.classify import (
    FEATURES,
    FROZEN_COEF,
    FROZEN_INTERCEPT,
    featurize,
    score_quality,
    score_quality_frozen,
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


@pytest.mark.slow  # heavy e2e/property: close-out tier (pytest.ini)
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


def test_frozen_margin_bit_exact_left_fold(spark, sf_smoke):
    """The frozen margin must equal a strict left-to-right Python fold
    over the same feature doubles BIT-EXACTLY — that identity is what
    the DuckDB oracle for classify-quality relies on."""
    docs = load_table(spark, sf_smoke, "documents")
    feat = featurize(docs)
    rows = score_quality_frozen(feat).join(feat, "doc_id").collect()
    assert rows
    for r in rows:
        z = FROZEN_INTERCEPT
        for name in FEATURES:
            c = FROZEN_COEF[name]
            if c != 0.0:
                z = z + c * r[name]
        assert r["margin"] == z, (r["doc_id"], r["margin"], z)
        assert r["model_keep"] == (z > 0)


def test_frozen_model_agrees_with_teacher(spark, sf_smoke):
    """The frozen distillation keeps its teacher agreement on fresh
    data (loose floor: regenerated corpora shift the distribution)."""
    docs = load_table(spark, sf_smoke, "documents")
    feat = featurize(docs)
    scored = score_quality_frozen(feat).join(
        feat.select("doc_id", "label"), "doc_id"
    )
    rows = scored.collect()
    agree = sum(
        1 for r in rows if (r["model_keep"] is True) == (r["label"] == 1.0)
    ) / len(rows)
    assert agree > 0.8
    # and it actually keeps something / rejects something
    kept = sum(1 for r in rows if r["model_keep"])
    assert 0 < kept < len(rows)


def test_frozen_scoring_is_shuffle_free(spark, sf_smoke):
    """Frozen scoring is the 100 TB path: one map stage, no Exchange,
    no Python evaluation in the plan."""
    docs = load_table(spark, sf_smoke, "documents")
    plan = score_quality_frozen(featurize(docs))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_zero_token_docs_featurize_and_score(spark, sf_smoke):
    """Empty / whitespace-only / punctuation-only docs must produce
    finite features (no NaN into the LR fit, no null into
    VectorAssembler) and train+score end-to-end alongside real docs."""
    import math

    docs = load_table(spark, sf_smoke, "documents").limit(50)
    weird = spark.createDataFrame(
        [(100001, ""), (100002, "   "), (100003, "?!?!...")],
        "doc_id long, text string",
    )
    both = docs.select("doc_id", "text").unionByName(weird)
    feat = featurize(both)
    rows = {r.doc_id: r for r in feat.collect()}
    for did in (100001, 100002, 100003):
        r = rows[did]
        for f in FEATURES:
            v = r[f]
            assert v is not None and math.isfinite(v), (did, f, v)
        assert r.label == 0.0  # teacher rule rejects empties
    model = train_quality_model(feat)
    scored = {r.doc_id: r for r in score_quality(model, feat).collect()}
    assert len(scored) == both.count()
    for did in (100001, 100002, 100003):
        assert 0.0 <= scored[did].quality_prob <= 1.0


def test_dsir_fit_prefers_target_like_docs(spark):
    from data_engineering_pipeline_spark.operators.classify import (
        dsir_scores,
        dsir_select_topk,
        fit_dsir_logratios,
    )

    target = spark.createDataFrame(
        [(i, "good clean prose about science and method") for i in range(8)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [(i, "spam buy now click here win prizes") for i in range(8)]
        + [(100 + i, "good clean prose about science and method")
           for i in range(2)],
        "doc_id long, text string",
    )
    lrs = fit_dsir_logratios(target, raw)
    assert len(lrs) == 512 and all(isinstance(v, int) for v in lrs)
    pool = spark.createDataFrame(
        [
            (1, "good clean prose about science and method"),
            (2, "spam buy now click here win prizes"),
            (3, "good clean prose mixed with spam buy now"),
        ],
        "doc_id long, text string",
    )
    scored = {r.doc_id: r for r in dsir_scores(pool, logratios=lrs).collect()}
    # target-distribution doc outranks the raw-pool doc; the mixture
    # lands between them
    assert scored[1].score_norm > scored[3].score_norm > scored[2].score_norm
    top = dsir_select_topk(dsir_scores(pool, logratios=lrs), 1).collect()
    assert [r.doc_id for r in top] == [1]


def test_dsir_frozen_scores_stable_under_repartition(spark):
    from data_engineering_pipeline_spark.operators.classify import (
        dsir_scores,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tok{i} epsilon") for i in range(40)],
        "doc_id long, text string",
    )
    a = {r.doc_id: (r.score, r.n_bigrams)
         for r in dsir_scores(docs).collect()}
    b = {r.doc_id: (r.score, r.n_bigrams)
         for r in dsir_scores(docs.repartition(7)).collect()}
    assert a == b and len(a) == 40


def test_dsir_dedup_hash_plan_is_result_identical(spark):
    from data_engineering_pipeline_spark.operators.classify import (
        dsir_scores,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i % 6} beta alpha") for i in range(50)]
        + [(100, "single")],  # no bigrams -> absent from both outputs
        "doc_id long, text string",
    )
    a = {
        r.doc_id: (r.n_bigrams, r.score, r.score_norm)
        for r in dsir_scores(docs).collect()
    }
    b = {
        r.doc_id: (r.n_bigrams, r.score, r.score_norm)
        for r in dsir_scores(docs, dedup_hash=True).collect()
    }
    assert a == b and len(a) == 50 and 100 not in a


def test_kneser_ney_distribution_normalizes(spark):
    """On a tiny corpus: for every context w1, the interpolated-KN
    probability over the FULL vocabulary (seen bigrams discounted +
    continuation back-off for everything) sums to 1 — the algebraic
    identity sum_seen (c12-D)/c1 + (D*nf/c1) * sum_all N1b/NB = 1.
    Recomputed in Python from the same counts the query uses."""
    from collections import Counter

    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
        "the mat and the rug",
    ]
    toks = [t.split() for t in texts]
    bigrams = Counter()
    for ts in toks:
        for a, b in zip(ts, ts[1:]):
            bigrams[(a, b)] += 1
    ctx = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), c in bigrams.items():
        ctx[a] += c
        n1f[a] += 1
        n1b[b] += 1
    nb = len(bigrams)
    vocab = {w for ts in toks for w in ts}
    D = 0.75
    for w1 in ctx:
        total = 0.0
        for w2 in vocab:
            cont = n1b.get(w2, 0) / nb
            seen = bigrams.get((w1, w2), 0)
            if seen:
                total += (seen - D) / ctx[w1] + (D * n1f[w1] / ctx[w1]) * cont
            else:
                total += (D * n1f[w1] / ctx[w1]) * cont
        assert abs(total - 1.0) < 1e-9, (w1, total)
    # the registered Spark query's own math is pinned relationally by
    # the oracle sweep (test_oracle_queries.py)


def test_kneser_ney3_distribution_normalizes(spark):
    """Trigram KN: for every seen context (w1, w2), the probability
    over the FULL vocabulary sums to 1 — each backoff level hands its
    discounted mass down exactly (trigram -> continuation bigram ->
    continuation unigram over bigram types)."""
    from collections import Counter

    texts = [
        "the cat sat on the mat",
        "the dog sat on the rug today",
        "a cat and a dog sat",
        "the mat and the rug",
    ]
    toks = [t.split() for t in texts]
    tri = Counter()
    bg = Counter()
    for ts in toks:
        for a, b, c in zip(ts, ts[1:], ts[2:]):
            tri[(a, b, c)] += 1
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] += 1
    ctx12 = Counter()
    nf12 = Counter()
    nb23 = Counter()
    nmid = Counter()
    nf2 = {}
    for (a, b, c), n in tri.items():
        ctx12[(a, b)] += n
        nf12[(a, b)] += 1
        nb23[(b, c)] += 1
        nmid[b] += 1
        nf2.setdefault(b, set()).add(c)
    ncont = Counter()
    for (a, b) in bg:
        ncont[b] += 1
    NB = len(bg)
    vocab = {w for ts in toks for w in ts}
    D = 0.75

    def p_cont(w3):
        return ncont.get(w3, 0) / NB

    def p_mid(w2, w3):
        lam = D * len(nf2.get(w2, ())) / nmid[w2]
        seen = nb23.get((w2, w3), 0)
        base = (seen - D) / nmid[w2] if seen else 0.0
        return base + lam * p_cont(w3)

    for (w1, w2) in ctx12:
        lam = D * nf12[(w1, w2)] / ctx12[(w1, w2)]
        total = 0.0
        for w3 in vocab:
            seen = tri.get((w1, w2, w3), 0)
            base = (seen - D) / ctx12[(w1, w2)] if seen else 0.0
            total += base + lam * p_mid(w2, w3)
        assert abs(total - 1.0) < 1e-9, ((w1, w2), total)
