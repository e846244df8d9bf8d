"""Unit tests for the curation operators: chunk-level dedup semantics,
PII redaction, mixture rebalancing, and the greedy sequence packer
(including the bucketed scale path the SQL oracle cannot grade)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.dedup import chunk_dedup
from data_engineering_pipeline_spark.operators.packing import (
    pack_greedy,
    pack_report,
)
from data_engineering_pipeline_spark.operators.sampling import (
    mixture_rebalance,
)
from data_engineering_pipeline_spark.operators.text import redact_pii


def test_chunk_dedup_first_occurrence_wins(spark):
    boiler = " ".join(f"t{i}" for i in range(10))
    uniq_a = " ".join(f"a{i}" for i in range(10))
    uniq_b = " ".join(f"b{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, f"{boiler} {uniq_a}"),
            (2, f"{boiler} {uniq_b}"),  # boilerplate chunk repeats
            (3, boiler),  # entirely duplicate -> empty output
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in chunk_dedup(df, "doc_id", "text", 10).collect()
    }
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_kept"] == 1 and out[2]["dedup_text"] == uniq_b
    assert out[3]["n_kept"] == 0 and out[3]["dedup_text"] == ""


def test_chunk_dedup_in_doc_repeats_collapse(spark):
    ch = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(7, f"{ch} {ch} {ch}")], "doc_id long, text string"
    )
    row = chunk_dedup(df, "doc_id", "text", 10).collect()[0]
    assert row["n_chunks"] == 3 and row["n_kept"] == 1
    assert row["dedup_text"] == ch


def test_redact_pii_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "call 415-555-2671 or ping 192.168.10.250 today"),
            (3, "clean text with no contact info at all"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["red"]
        for r in df.select(
            "doc_id", redact_pii("text").alias("red")
        ).collect()
    }
    assert rows[1] == "mail <EMAIL> now"
    assert rows[2] == "call <PHONE> or ping <IP> today"
    assert rows[3] == "clean text with no contact info at all"


def test_mixture_rebalance_partitioning_invariant(spark, sf_smoke):
    from data_engineering_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_smoke, "documents")
    a = mixture_rebalance(docs, "lang", F.col("doc_id"))
    b = mixture_rebalance(docs.repartition(13), "lang", F.col("doc_id"))
    ids = lambda d: sorted(r["doc_id"] for r in d.select("doc_id").collect())  # noqa: E731
    assert ids(a) == ids(b)
    # every stratum survives, and the largest is cut toward the smallest
    n_in = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    n_out = {r["lang"]: r["n"] for r in a.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert set(n_out) == set(n_in)
    assert max(n_out.values()) < max(n_in.values())


def _pack_rows(spark, rows, budget, **kw):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return sorted(
        (r["doc_id"], r["pack_id"], r["pack_pos"])
        for r in pack_greedy(df, budget, **kw).collect()
    )


def test_pack_greedy_exact_boundaries(spark):
    # budget 10: [4,6] fill pack0 exactly; 5 opens pack1; 11 oversize
    # alone in pack2; 1 starts pack3
    rows = [(1, 4), (2, 6), (3, 5), (4, 11), (5, 1)]
    got = _pack_rows(spark, rows, 10)
    assert got == [(1, 0, 0), (2, 0, 1), (3, 1, 0), (4, 2, 0), (5, 3, 0)]


def test_pack_bucketed_path_respects_budget(spark, sf_smoke):
    from data_engineering_pipeline_spark.sources import load_table
    from data_engineering_pipeline_spark.operators.text import tokens

    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id", F.size(tokens("text")).alias("n_tokens")
    )
    packed = pack_greedy(docs, 256, bucket_width=100)
    rep = pack_report(packed).collect()
    # every pack within budget (no doc here exceeds it), all docs packed
    assert all(r["pack_tokens"] <= 256 for r in rep)
    assert sum(r["n_docs"] for r in rep) == docs.count()
    # packs never span buckets: id range within one bucket width
    for r in rep:
        assert r["first_doc"] // 100 == r["last_doc"] // 100
    # deterministic under repartitioning
    again = pack_report(
        pack_greedy(docs.repartition(17), 256, bucket_width=100)
    ).collect()
    assert sorted(map(tuple, rep)) == sorted(map(tuple, again))


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _pack_model(weights, budget):
    """Reference greedy packer: list of (pack_id, pack_pos) in doc order."""
    out, cur, fill, pos = [], 0, 0, 0
    for w in weights:
        if fill > 0 and fill + w > budget:
            cur, fill, pos = cur + 1, 0, 0
        out.append((cur, pos))
        fill += w
        pos += 1
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(st.integers(min_value=0, max_value=15), min_size=1, max_size=30),
    budget=st.integers(min_value=1, max_value=12),
)
def test_pack_greedy_matches_model(spark, weights, budget):
    rows = [(i, w) for i, w in enumerate(weights)]
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"])
        for r in pack_greedy(
            spark.createDataFrame(rows, "doc_id long, n_tokens long"), budget
        ).collect()
    }
    model = _pack_model(weights, budget)
    assert got == {i: pp for i, pp in enumerate(model)}


def test_boilerplate_segments_drops_every_occurrence(spark):
    from data_engineering_pipeline_spark.operators.dedup import (
        boilerplate_segments,
    )

    header = "COOKIE NOTICE accept all"
    df = spark.createDataFrame(
        [
            (1, f"{header}\nunique alpha line\nshared tail"),
            (2, f"{header}\nunique beta line\nShared Tail"),  # case-folds
            (3, f"{header}\nonly here"),
            (4, "no boilerplate at all"),
            (5, ""),  # empty doc -> zero segments
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in boilerplate_segments(df, "doc_id", "text", min_docs=2)
        .collect()
    }
    # header appears in 3 docs, "shared tail" (case-insensitive) in 2:
    # both drop from EVERY doc, first occurrences included
    assert out[1]["n_segments"] == 3 and out[1]["n_boiler"] == 2
    assert out[1]["clean_text"] == "unique alpha line"
    assert out[2]["clean_text"] == "unique beta line"
    assert out[3]["clean_text"] == "only here"
    assert out[4]["n_boiler"] == 0
    assert out[4]["clean_text"] == "no boilerplate at all"
    assert out[5]["n_segments"] == 0 and out[5]["clean_text"] == ""


def test_pack_query_null_text_is_zero_weight(spark, tmp_path):
    """r10 review: a null-text document reaches curation-pack as
    weight 0 (coalesced token count), not as a NULL weight that would
    trip pack_greedy's fail-loud guard and kill the whole job."""
    import duckdb

    from data_engineering_pipeline_spark.queries.curation import QUERIES

    src = "/root/testdata/sf0.001/documents.parquet"
    d = str(tmp_path)
    duckdb.sql(f"""
      COPY (
        SELECT * FROM (SELECT * FROM '{src}' LIMIT 20)
        UNION ALL BY NAME
        SELECT * FROM (VALUES (9000001, CAST(NULL AS VARCHAR), 'en',
                               'src0', CAST(NULL AS BIGINT)))
          t(doc_id, text, lang, source, n_chars)
      ) TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    out = QUERIES["curation-pack"](spark, d).collect()
    assert out  # runs to completion; the null doc packs at weight 0
