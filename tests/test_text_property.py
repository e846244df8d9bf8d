"""Property tests for the portable text primitives: each has a plain
Python model executed on hypothesis-generated inputs, pinning the Spark
expression semantics independently of the DuckDB oracles (which pin the
same functions relationally). Batch style: each example set becomes one
small DataFrame, so a property costs a handful of Spark jobs."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.dedup import normalize_text
from data_engineering_pipeline_spark.operators.text import (
    FINGERPRINT_BASE,
    FINGERPRINT_MOD,
    PII_PATTERNS,
    fingerprint,
    redact_pii,
)

_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=80,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _fingerprint_model(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * FINGERPRINT_BASE + ord(ch)) % FINGERPRINT_MOD
    return acc


@settings(**_SETTINGS)
@given(texts=st.lists(_ASCII, min_size=1, max_size=20))
def test_fingerprint_matches_python_model(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    got = {
        r.id: r.fp
        for r in df.select("id", fingerprint("text").alias("fp")).collect()
    }
    assert got == {i: _fingerprint_model(t) for i, t in enumerate(texts)}


def _normalize_model(s: str) -> str:
    s = s.lower()
    s = re.sub(r"[.,!?;:\'\"()]", "", s)
    s = re.sub(r"\s+", " ", s)
    return s.strip()


@settings(**_SETTINGS)
@given(texts=st.lists(_ASCII, min_size=1, max_size=20))
def test_normalize_text_matches_model_and_is_idempotent(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string"
    )
    out = df.select(
        "id",
        normalize_text("text").alias("once"),
        normalize_text(normalize_text("text")).alias("twice"),
    ).collect()
    for r in out:
        assert r.once == _normalize_model(texts[r.id])
        assert r.twice == r.once  # idempotent: already-canonical input


_PII_PIECES = st.sampled_from(
    [
        "contact bob.smith+x@example.co.uk now",
        "call 555-123-4567 or",
        "from 192.168.001.12 at",
        "plain words only",
        "a@b.io",
        "1.2.3.4",
        "ext 555-000-1111",
    ]
)


@settings(**_SETTINGS)
@given(parts=st.lists(_PII_PIECES, min_size=1, max_size=6))
def test_redact_pii_leaves_no_matches(spark, parts):
    """After redaction, none of the PII patterns (the same RE2/Java
    common-subset strings, here executed by Python re) match anywhere,
    and rows with no PII pass through unchanged."""
    text = " ".join(parts)
    df = spark.createDataFrame([(0, text)], "id long, text string")
    red = df.select(redact_pii("text").alias("t")).collect()[0].t
    for _, pat, _ in PII_PATTERNS:
        assert re.search(pat, red) is None, (pat, red)
    clean = "no pii here at all"
    df2 = spark.createDataFrame([(0, clean)], "id long, text string")
    assert df2.select(redact_pii("text").alias("t")).collect()[0].t == clean


def test_bpe_train_learns_expected_merges(spark):
    from data_engineering_pipeline_spark.operators.search import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(1, "low low low lower lowest"), (2, "new newer newest aaaa")],
        "doc_id long, text string",
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train_merges(docs, "text", 6)
        .orderBy("merge_rank")
        .collect()
    ]
    # hand-derived: (l,o) ties (o,w) at 5 -> lex; "aaaa" yields THREE
    # overlapping (a,a) pairs and merges to [aa, aa] greedily; round 5
    # is a 5-way tie at count 2 -> (e,r) lexicographically first
    assert got == [
        (0, "l", "o", 5),
        (1, "lo", "w", 5),
        (2, "a", "a", 3),
        (3, "e", "w", 3),
        (4, "n", "ew", 3),
        (5, "e", "r", 2),
    ]


def test_bpe_train_stable_under_repartition(spark):
    from data_engineering_pipeline_spark.operators.search import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma tok{i % 5} delta") for i in range(40)],
        "doc_id long, text string",
    )
    a = [tuple(r) for r in bpe_train_merges(docs, "text", 4).collect()]
    b = [
        tuple(r)
        for r in bpe_train_merges(docs.repartition(7), "text", 4).collect()
    ]
    assert a == b and len(a) == 4


def _bpe_model(texts: list[str], n_merges: int):
    """Pure-Python BPE trainer mirroring bpe_train_merges exactly:
    overlapping weighted pair counts, argmax by (count desc, lhs, rhs),
    greedy left-to-right non-overlapping merge application."""
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in t.lower().split():
            if w:
                words[w] += 1
    vocab = {w: [c for c in w] for w in words}
    merges = []
    for r in range(n_merges):
        pairs = Counter()
        for w, pieces in vocab.items():
            for a, b in zip(pieces, pieces[1:]):
                pairs[(a, b)] += words[w]
        if not pairs:
            break
        (pa, pb), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, pa, pb, c))
        for w, pieces in vocab.items():
            out, i = [], 0
            while i < len(pieces):
                if (
                    i + 1 < len(pieces)
                    and pieces[i] == pa
                    and pieces[i + 1] == pb
                ):
                    out.append(pa + pb)
                    i += 2
                else:
                    out.append(pieces[i])
                    i += 1
            vocab[w] = out
    return merges


@given(
    st.lists(
        st.text(alphabet="ab c", min_size=1, max_size=24),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_bpe_train_matches_python_model(spark, texts):
    from data_engineering_pipeline_spark.operators.search import (
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train_merges(docs, "text", 3)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == _bpe_model(texts, 3)


def test_text_metrics_survive_pathological_docs(spark):
    """r9 review: a zero-token document (whitespace-only text passes a
    length(text) gate upstream) raised ANSI DIVIDE_BY_ZERO inside
    quality_score / stopword_ratio / mean_token_length / punct_ratio —
    one bad doc killed the whole curation job. Ratios are NULL on
    empty input; quality is an explicit 0.0 (a null-propagating raw
    would slip through least/greatest — they skip nulls — as 1.0)."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_spark.operators.text import (
        mean_token_length,
        punct_ratio,
        quality_score,
        stopword_ratio,
    )

    df = spark.createDataFrame(
        [("",), ("   ",), ("\t\n ",), ("fine text with tokens",)],
        "text string",
    )
    rows = df.select(
        "text",
        quality_score("text").alias("q"),
        stopword_ratio("text").alias("sw"),
        mean_token_length("text").alias("mtl"),
        punct_ratio("text").alias("pr"),
    ).collect()
    by_text = {r.text: r for r in rows}
    for t in ("", "   ", "\t\n "):
        assert by_text[t].q == 0.0
        assert by_text[t].sw is None and by_text[t].mtl is None
    assert by_text["fine text with tokens"].q > 0.0
    # and the curation quality filter passes a whitespace doc through
    # at min_quality 0.0 instead of crashing
    from data_engineering_pipeline_spark.plans.curation_pipeline import (
        _filter_quality,
    )

    ws = spark.createDataFrame(
        [(1, "en", " " * 25), (2, "en", "real document text body")],
        "doc_id long, lang string, text string",
    )
    assert _filter_quality(ws, 0.0).count() == 2
    assert _filter_quality(ws, 0.1).count() == 1


def test_gopher_rules_hand_computed(spark):
    """gopher_rules (r10): hand-computed rule booleans on edge docs —
    empty/whitespace docs fail word_count without any ANSI division
    error, symbol-laden docs fail symbol_ratio, numeric docs fail
    alpha_words, and a clean doc inside every band keeps."""
    from data_engineering_pipeline_spark.operators.text import (
        gopher_rules,
    )

    clean = ("the quick brown fox jumps over the lazy dog and runs "
             "into the wide field of tall grass near a quiet stream")
    docs = [
        (1, clean),                              # keeps (bounds 10..40)
        (2, ""),                                 # empty: word_count False
        (3, "   "),                              # whitespace-only
        (4, "### " * 15 + "the a of to in is"),  # symbol-heavy
        (5, "1 2 3 4 5 6 7 8 9 10 11 12 the a"), # numeric: alpha fails
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rules = gopher_rules("text", min_tokens=10, max_tokens=40)
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[rules[k].alias(k) for k in
                        ("word_count", "mean_word_len", "symbol_ratio",
                         "alpha_words", "stop_words", "keep")]
        ).collect()
    }
    assert got[1].keep is True
    assert got[2].word_count is False and not got[2].keep
    assert got[3].word_count is False and not got[3].keep
    assert got[4].symbol_ratio is False and not got[4].keep
    assert got[5].alpha_words is False and not got[5].keep
