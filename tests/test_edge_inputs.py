"""Edge-input sweeps over the ENTIRE query registry (r10 review
instrument, made permanent): every registered query must RUN — not
necessarily return rows — against

  (a) EMPTY tables: zero-row copies of all ten testdata tables with
      identical schemas (the empty-partition / filter-matched-nothing
      state that is routine at corpus scale), and
  (b) ADVERSARIAL rows: null/whitespace/empty text documents, null and
      zero-norm and all-NaN embeddings, and an all-null event row
      appended to tiny copies of the real tables.

The r10 sweep found seven real crashes this net now pins (snapshot
read() of a fully-deleted table, pagerank ZeroDivisionError, KMeans on
empty/NaN corpora, hardcoded change-feed versions, NULL pack weights,
NULL observe() metrics). One failing query names itself in the assert;
the sweep keeps going so a single regression doesn't mask others."""

from __future__ import annotations

import os

import duckdb
import pytest

# registry-wide e2e sweeps (~3 min together): close-out tier, not the
# per-commit path (pytest.ini; r13 verdict item 2)
pytestmark = pytest.mark.slow

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def registry():
    from data_engineering_pipeline_spark.queries import collect_registry

    queries, _ = collect_registry()
    return queries


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory, sf_smoke):
    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{sf_smoke}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(d)


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory, sf_smoke):
    d = tmp_path_factory.mktemp("sf_dirty")
    con = duckdb.connect()
    for t in TABLES:
        if t in ("documents", "embeddings", "events"):
            continue
        con.sql(
            f"COPY (SELECT * FROM '{sf_smoke}/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.sql(f"""
      COPY (
        SELECT * FROM (SELECT * FROM '{sf_smoke}/documents.parquet'
                       LIMIT 100)
        UNION ALL BY NAME
        SELECT * FROM (VALUES
          (9000001, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)),
          (9000002, '   ', 'en', 'src0', 3),
          (9000003, '', 'xx', 'src11', 0),
          (9000004, 'one', 'de', 'src1', 3)
        ) t(doc_id, text, lang, source, n_chars)
      ) TO '{d}/documents.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
      COPY (
        SELECT * FROM '{sf_smoke}/embeddings.parquet'
        UNION ALL BY NAME
        SELECT * FROM (VALUES
          (9000001, CAST(NULL AS FLOAT[]), CAST(NULL AS INTEGER)),
          (9000002, CAST(list_transform(range(64), x -> 0.0)
                         AS FLOAT[]), 1),
          (9000003, CAST(list_transform(range(64),
                         x -> CAST('nan' AS FLOAT)) AS FLOAT[]), 2)
        ) t(vec_id, embedding, label)
      ) TO '{d}/embeddings.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
      COPY (
        SELECT * FROM (SELECT * FROM '{sf_smoke}/events.parquet'
                       LIMIT 200)
        UNION ALL BY NAME
        SELECT * FROM (VALUES
          (9000001, CAST(NULL AS TIMESTAMP), CAST(NULL AS BIGINT),
           CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
           CAST(NULL AS VARCHAR))
        ) t(event_id, ts, user_id, event_type, value, props)
      ) TO '{d}/events.parquet' (FORMAT PARQUET)
    """)
    con.close()
    return str(d)


def _sweep(spark, registry, sf_dir: str) -> list[str]:
    fails = []
    for name, fn in registry.items():
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # noqa: BLE001 — the sweep reports all
            fails.append(f"{name}: {type(exc).__name__}: "
                         f"{str(exc).splitlines()[0][:120]}")
    return fails


def test_every_query_runs_on_empty_tables(spark, registry, empty_dir):
    fails = _sweep(spark, registry, empty_dir)
    assert not fails, f"{len(fails)} queries crash on empty tables: " \
        + "; ".join(fails[:5])


def test_every_query_runs_on_adversarial_rows(spark, registry, dirty_dir):
    fails = _sweep(spark, registry, dirty_dir)
    assert not fails, f"{len(fails)} queries crash on dirty rows: " \
        + "; ".join(fails[:5])
