"""The main correctness gate, run locally: every queries() entry with an
oracle must match DuckDB at sf0.01 (mirrors the driver's CORRECTNESS
check). Entries without an oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from data_engineering_pipeline_spark.queries import collect_registry
from tests.oracle_harness import compare, duckdb_conn

QUERIES, ORACLES = collect_registry()


@pytest.fixture(scope="module")
def con(sf_correct):
    c = duckdb_conn(sf_correct)
    yield c
    c.close()


@pytest.mark.slow  # ~30 min: the full 171-query sweep at sf0.01 — the
# close-out gate, not the per-commit path (pytest.ini; r13 verdict #2)
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_correct, con):
    df = QUERIES[name](spark, sf_correct)
    if name in ORACLES:
        problems = compare(df, con, ORACLES[name])
        assert not problems, f"{name}: " + "; ".join(problems)
    else:
        # rows-only smoke: runs and yields a stable schema
        assert df.columns
        df.collect()


def test_approx_count_distinct_within_bound(spark, sf_correct):
    """Sketch aggregates (HyperLogLog++): no oracle (approximate by
    design) — assert the estimate is within the documented rsd bound of
    the exact count. At 100 TB this one-pass mergeable sketch replaces
    the expensive exact DISTINCT expansion."""
    from pyspark.sql import functions as F

    from data_engineering_pipeline_spark.sources import load_table

    li = load_table(spark, sf_correct, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_partkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.1


def test_approx_quantiles_within_bound(spark, sf_correct):
    """Quantile sketch (Greenwald-Khanna approxQuantile): like the HLL
    check above, no oracle (approximate by design) — assert the sketch
    at relativeError=0.01 brackets the exact percentile ranks. The
    one-pass mergeable sketch is what replaces a full sort for
    percentile reporting at 100 TB."""
    from data_engineering_pipeline_spark.sources import load_table

    li = load_table(spark, sf_correct, "lineitem").select(
        "l_extendedprice"
    )
    qs = [0.25, 0.5, 0.9, 0.99]
    approx = li.approxQuantile("l_extendedprice", qs, 0.01)
    n = li.count()
    vals = [r[0] for r in li.collect()]
    vals.sort()
    for q, a in zip(qs, approx):
        # value at rank within +-1% of n around the target rank
        lo = vals[max(0, int((q - 0.011) * n))]
        hi = vals[min(n - 1, int((q + 0.011) * n))]
        assert lo <= a <= hi


def test_registry_loads_every_module_loudly():
    """collect_registry warns-and-continues when a query module fails
    to import, which silently shrinks the graded surface (the
    parameterized tests above simply vanish for the lost module). Fail
    loudly instead: no load warnings, and the registry holds the full
    complement."""
    import warnings

    from data_engineering_pipeline_spark.queries import collect_registry

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        qs, oracles = collect_registry()
    assert len(qs) >= 105
    assert len(oracles) >= 104
    assert set(oracles) <= set(qs)
