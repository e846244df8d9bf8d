"""Reference-parity golden test (SURVEY.md §5.2b): a synthetic
two-indicator panel (FIXTURES.md §B) run through the Spark pipeline must
match a straight-Python golden implementation of the reference's
transform semantics (transformer.py:58-119 — join, drop-null, per-country
lag1, 5-row rolling means with min-periods=3, round to 4 dp), including
the gap and min-periods edge cases."""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_pipeline_spark.operators.windows import (
    lag_feature,
    ordered_window,
    rolling_mean,
)

COUNTRIES = [f"C{i:02d}" for i in range(10)]
YEARS = list(range(2000, 2024))


def _panel(seed: int):
    """Deterministic panel with NULL values (gaps post-filter), country-
    years missing from one side (exercises inner join), and short leading
    runs (exercises min-periods)."""
    rng = random.Random(seed)
    rows = []
    for c in COUNTRIES:
        for y in YEARS:
            if rng.random() < 0.15:
                continue  # missing row on this side
            v = None if rng.random() < 0.2 else round(rng.uniform(-5, 15), 4)
            rows.append((c, y, v))
    return rows


def _golden(gdp_rows, unemp_rows):
    """Pure-Python reimplementation of the reference's semantics."""
    gdp = {(c, y): v for c, y, v in gdp_rows}
    unemp = {(c, y): v for c, y, v in unemp_rows}
    joined = [
        (c, y, gdp[(c, y)], unemp[(c, y)])
        for (c, y) in sorted(set(gdp) & set(unemp))
        if gdp[(c, y)] is not None and unemp[(c, y)] is not None
    ]
    by_country: dict[str, list] = {}
    for c, y, g, u in joined:
        by_country.setdefault(c, []).append((y, g, u))
    out = {}
    for c, series in by_country.items():
        series.sort()
        for i, (y, g, u) in enumerate(series):
            lag1 = round(series[i - 1][1], 4) if i >= 1 else None
            gw = [r[1] for r in series[max(0, i - 4) : i + 1]]
            uw = [r[2] for r in series[max(0, i - 4) : i + 1]]
            roll_g = round(sum(gw) / len(gw), 4) if len(gw) >= 3 else None
            roll_u = round(sum(uw) / len(uw), 4) if len(uw) >= 3 else None
            out[(c, y)] = (round(g, 4), round(u, 4), lag1, roll_g, roll_u)
    return out


def test_pipeline_matches_golden_python(spark):
    schema = T.StructType(
        [
            T.StructField("country_iso3", T.StringType()),
            T.StructField("year", T.IntegerType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    gdp_rows = _panel(seed=1)
    unemp_rows = _panel(seed=2)
    gdp = spark.createDataFrame(gdp_rows, schema)
    unemp = spark.createDataFrame(unemp_rows, schema)

    joined = (
        gdp.alias("g")
        .join(unemp.alias("u"), on=["country_iso3", "year"], how="inner")
        .filter(F.col("g.value").isNotNull() & F.col("u.value").isNotNull())
        .select(
            "country_iso3",
            "year",
            F.col("g.value").alias("gdp_growth"),
            F.col("u.value").alias("unemployment"),
        )
    )
    w = ordered_window(["country_iso3"], ["year"])
    result = (
        joined.withColumn("gdp_growth_lag1", lag_feature("gdp_growth", w))
        .withColumn("gdp_growth_roll5", rolling_mean("gdp_growth", w))
        .withColumn("unemp_roll5", rolling_mean("unemployment", w))
    )

    golden = _golden(gdp_rows, unemp_rows)
    got = {
        (r.country_iso3, r.year): (
            r.gdp_growth,
            r.unemployment,
            r.gdp_growth_lag1,
            r.gdp_growth_roll5,
            r.unemp_roll5,
        )
        for r in result.collect()
    }
    assert set(got) == set(golden)
    n_checked_roll = 0
    for key, (g, u, lag1, rg, ru) in golden.items():
        sg, su, slag, srg, sru = got[key]
        assert (sg, su) == (g, u), key
        assert slag == lag1, (key, slag, lag1)
        # rolling means: float-vs-decimal rounding can differ in the last
        # ulp at the 4th dp; compare within 1e-4 and null-pattern exactly
        for mine, gold in ((srg, rg), (sru, ru)):
            assert (mine is None) == (gold is None), key
            if gold is not None:
                assert abs(mine - gold) < 1.1e-4, (key, mine, gold)
                n_checked_roll += 1
    assert n_checked_roll > 100  # the gate actually exercised


def test_min_periods_gate_nulls_first_two_rows(spark):
    schema = "country_iso3 string, year int, value double"
    df = spark.createDataFrame(
        [("AAA", 2000 + i, float(i)) for i in range(6)], schema
    )
    w = ordered_window(["country_iso3"], ["year"])
    out = (
        df.withColumn("roll5", rolling_mean("value", w))
        .orderBy("year")
        .collect()
    )
    assert [r.roll5 for r in out] == [
        None,
        None,
        1.0,  # mean(0,1,2)
        1.5,  # mean(0..3)
        2.0,  # mean(0..4)
        3.0,  # mean(1..5)
    ]


def test_lag_is_row_based_over_gaps(spark):
    """A missing year creates a gap; lag1 must return the previous
    AVAILABLE year's value (row-based), not year-1's (range-based)."""
    schema = "country_iso3 string, year int, value double"
    df = spark.createDataFrame(
        [("AAA", 2000, 1.0), ("AAA", 2003, 2.0), ("AAA", 2004, 3.0)], schema
    )
    w = ordered_window(["country_iso3"], ["year"])
    out = df.withColumn("lag1", lag_feature("value", w)).orderBy("year").collect()
    assert [r.lag1 for r in out] == [None, 1.0, 2.0]
