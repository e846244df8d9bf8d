"""Reference-parity pipeline (SURVEY.md §7.1) — the flagship query.

Mirrors the reference's transform stage end-to-end (transformer.py:58-119):

    read two keyed time-series tables
    -> inner equi-join on composite key (transformer.py:66-69)
    -> drop-null filter (transformer.py:70-71)
    -> project/alias (transformer.py:60-65)
    -> lag(1) + two 5-row trailing means gated on count>=3
       (transformer.py:99-105)
    -> round(,4) (transformer.py:104-113)
    -> ordered output (transformer.py:72)

The reference's panel is (country_iso3, year) World Bank indicators; here
the panel is derived from the driver testdata: a "gdp-like" series (yearly
mean order value per nation, via customers) and an "unemployment-like"
series (yearly mean lineitem quantity per nation, via suppliers). Sparse
(nation, year) cells become NULL observations (count below a floor),
so the drop-null filter and the gap semantics of the row-based windows are
genuinely exercised, exactly as in the reference data (README1.md:159).

Scale notes: nation is tiny -> broadcast joins (no shuffle for the
dimension side); the two aggregations shuffle on (country, year); the
window shuffles on country only. At 100 TB the aggregations are the heavy
stages and they partial-aggregate map-side; the window state per country
is bounded by years, so no skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.queries._exact import (
    mean_int_round4,
    mean_money_round4,
)
from data_engineering_pipeline_spark.operators.windows import (
    lag_feature,
    ordered_window,
    rolling_mean,
)
from data_engineering_pipeline_spark.sources import load_table


def gdp_like_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly mean order value (k) per nation; NULL when <3 observations."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("country"),
            F.year("o_orderdate").cast("int").alias("year"),
        )
        .agg(
            # exact integer half-up rounding (queries/_exact.py): a
            # rounded double mean can land on a representable half at
            # 4 dp, where Spark and DuckDB legitimately disagree
            F.when(
                F.count(F.lit(1)) >= 3,
                mean_money_round4("o_totalprice", divisor=1000),
            ).alias("value")
        )
    )


def unemp_like_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly mean lineitem quantity per nation; NULL when <5 observations."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("country"),
            F.year("l_shipdate").cast("int").alias("year"),
        )
        .agg(
            F.when(
                F.count(F.lit(1)) >= 5,
                mean_int_round4("l_quantity"),
            ).alias("value")
        )
    )


def parity_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference transform as one lazy Spark plan."""
    a = gdp_like_series(spark, sf_dir)
    b = unemp_like_series(spark, sf_dir)

    joined = (
        a.join(b, on=["country", "year"], how="inner")  # op-join-inner-equi
        .filter(a["value"].isNotNull() & b["value"].isNotNull())  # op-filter-notnull
        .select(  # op-project-alias
            "country",
            "year",
            a["value"].alias("gdp_growth"),
            b["value"].alias("unemployment"),
        )
    )

    # roll5 rounds to 6 dp (not the reference's 4): the inputs are 4-dp
    # values, so a 5-row mean can land EXACTLY on a .00005 half — where
    # Spark (HALF_UP) and other engines legitimately disagree. Means of
    # 4-dp values over counts <= 5 terminate within 6 decimals, so a 6-dp
    # round is exact and engine-independent.
    w = ordered_window(["country"], ["year"])
    return (
        joined.withColumn("gdp_growth_lag1", lag_feature("gdp_growth", w))
        .withColumn("gdp_growth_roll5", rolling_mean("gdp_growth", w, scale=6))
        .withColumn("unemp_roll5", rolling_mean("unemployment", w, scale=6))
        .orderBy("country", "year")  # op-sort-global
    )


_PANEL_CTES = """
WITH a AS (
  SELECT n.n_name AS country,
         CAST(year(o.o_orderdate) AS INTEGER) AS year,
         CASE WHEN count(*) >= 3
              THEN floor((CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(12,2))
                       * 100 AS BIGINT)) AS BIGINT) * 200 + count(*) * 1000)
                     / (count(*) * 2000)) / 10000.0 END AS value
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
), b AS (
  SELECT n.n_name AS country,
         CAST(year(l.l_shipdate) AS INTEGER) AS year,
         CASE WHEN count(*) >= 5
              THEN floor((CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                       * 20000 + count(*))
                     / (count(*) * 2)) / 10000.0 END AS value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
"""

PARITY_ORACLE = (
    _PANEL_CTES
    + """
, j AS (
  SELECT a.country, a.year, a.value AS gdp_growth, b.value AS unemployment
  FROM a JOIN b ON a.country = b.country AND a.year = b.year
  WHERE a.value IS NOT NULL AND b.value IS NOT NULL
)
SELECT country, year, gdp_growth, unemployment,
       round(lag(gdp_growth) OVER w, 4) AS gdp_growth_lag1,
       CASE WHEN count(gdp_growth) OVER w5 >= 3
            THEN round(avg(gdp_growth) OVER w5, 6) END AS gdp_growth_roll5,
       CASE WHEN count(unemployment) OVER w5 >= 3
            THEN round(avg(unemployment) OVER w5, 6) END AS unemp_roll5
FROM j
WINDOW w AS (PARTITION BY country ORDER BY year),
       w5 AS (PARTITION BY country ORDER BY year
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
ORDER BY country, year
"""
)

QUERIES = {
    "parity-pipeline": parity_pipeline,
}

ORACLES = {
    "parity-pipeline": PARITY_ORACLE,
}
