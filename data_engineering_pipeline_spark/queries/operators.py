"""Per-operator micro-queries (SURVEY.md §2 inventory -> queries()).

Each op-* id from the survey gets a small query over the driver testdata
plus a matching DuckDB oracle. Column names/aliases are kept identical on
both sides (the driver's compare sorts columns by name before hashing).

Determinism rules observed throughout:
- never a bare LIMIT without a total ORDER BY (top-k needs a tiebreak);
- window ORDER BY always includes a unique tiebreak column;
- try_cast (not cast) wherever a failure must become NULL — Spark 4 runs
  ANSI mode by default, so a plain cast would raise where the reference
  skips the row (database.py:107-111).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.upsert import merge_last_write_wins
from data_engineering_pipeline_spark.operators.windows import (
    lag_feature,
    ordered_window,
    rolling_mean,
)
from data_engineering_pipeline_spark.sources import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- §2.1 scans / sinks -------------------------------------------------

@_register(
    "op-scan-ordered",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
)
def op_scan_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table ordered scan (database.py:143-157)."""
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    ).orderBy("n_nationkey")


@_register(
    "op-sink-upsert",
    """
    WITH existing AS (
      SELECT o_orderkey, o_totalprice, 0 AS version FROM orders
    ), incoming AS (
      SELECT o_orderkey, round(o_totalprice * 1.1, 4) AS o_totalprice,
             1 AS version
      FROM orders WHERE o_orderkey % 10 = 0
    ), unioned AS (
      SELECT * FROM existing UNION ALL SELECT * FROM incoming
    )
    SELECT o_orderkey, o_totalprice FROM unioned
    QUALIFY row_number() OVER (
      PARTITION BY o_orderkey ORDER BY version DESC) = 1
    ORDER BY o_orderkey
    """,
)
def op_sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent merge-by-key (database.py:119-131): incoming updates for
    every 10th order win over the existing rows; everything else passes
    through unchanged."""
    orders = load_table(spark, sf_dir, "orders")
    existing = orders.select("o_orderkey", "o_totalprice").withColumn(
        "version", F.lit(0)
    )
    incoming = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 1.1, 4).alias("o_totalprice"),
        )
        .withColumn("version", F.lit(1))
    )
    merged = merge_last_write_wins(existing, incoming, ["o_orderkey"], "version")
    return merged.select("o_orderkey", "o_totalprice").orderBy("o_orderkey")


@_register(
    "op-json-extract",
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k,
           coalesce(json_extract_string(props, '$.missing'), 'absent')
             AS prop_fallback
    FROM events ORDER BY event_id
    """,
)
def op_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON field extraction with coalesce fallback
    (database.py:96-102)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").try_cast("int").alias("prop_k"),
        F.coalesce(
            F.get_json_object("props", "$.missing"), F.lit("absent")
        ).alias("prop_fallback"),
    ).orderBy("event_id")


@_register(
    "op-validate-cast",
    """
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN 'bad-' || event_type
                  ELSE CAST(event_id AS VARCHAR) END AS year_str
      FROM events
    ), casted AS (
      SELECT event_id, TRY_CAST(year_str AS INTEGER) AS year FROM src
    )
    SELECT event_id, year FROM casted WHERE year IS NOT NULL
    ORDER BY event_id
    """,
)
def op_validate_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validating cast with bad-row skip (database.py:104-111): malformed
    values cast to NULL and are filtered out (the quarantine is the
    complement filter)."""
    events = load_table(spark, sf_dir, "events")
    src = events.select(
        "event_id",
        F.when(
            F.col("event_id") % 5 == 0,
            F.concat(F.lit("bad-"), F.col("event_type")),
        )
        .otherwise(F.col("event_id").cast("string"))
        .alias("year_str"),
    )
    casted = src.select(
        "event_id", F.col("year_str").try_cast("int").alias("year")
    )
    return casted.filter(F.col("year").isNotNull()).orderBy("event_id")


# --- §2.2 projections / filters ----------------------------------------

@_register(
    "op-project-alias",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue,
           l_returnflag AS flag
    FROM lineitem ORDER BY l_orderkey, l_linenumber
    """,
)
def op_project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with renaming/derived columns (transformer.py:60-65)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "revenue"
        ),
        F.col("l_returnflag").alias("flag"),
    ).orderBy("l_orderkey", "l_linenumber")


@_register(
    "op-filter-notnull",
    """
    WITH src AS (
      SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status,
             nullif(o_orderpriority, '5-LOW') AS priority
      FROM orders
    )
    SELECT o_orderkey, status, priority FROM src
    WHERE status IS NOT NULL AND priority IS NOT NULL
    ORDER BY o_orderkey
    """,
)
def op_filter_notnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-null predicate over two columns (transformer.py:70-71)."""
    orders = load_table(spark, sf_dir, "orders")
    src = orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("P")).alias("status"),
        F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")).alias("priority"),
    )
    return src.filter(
        F.col("status").isNotNull() & F.col("priority").isNotNull()
    ).orderBy("o_orderkey")


# --- §2.3 joins ----------------------------------------------------------

@_register(
    "op-join-inner-equi",
    """
    SELECT o.o_orderkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_orderkey
    """,
)
def op_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join (transformer.py:66-69). customer is dimension-sized
    -> broadcast: no shuffle of the fact side at any scale."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer), orders.o_custkey == customer.c_custkey
        )
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    )


# --- §2.4 aggregations ----------------------------------------------------

@_register(
    "op-agg-count",
    """
    SELECT o_orderstatus, count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def op_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(*) reporting (database.py:161-169), grouped for substance.
    Partial (map-side) aggregation is automatic for count/sum."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@_register(
    "op-groupby-collect",
    """
    SELECT c_custkey, c_nationkey,
           CAST(row_number() OVER (
             PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rank_in_nation,
           count(*) OVER (PARTITION BY c_nationkey) AS nation_size
    FROM customer ORDER BY c_custkey
    """,
)
def op_groupby_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's group-into-lists (transformer.py:84-92) is grouping
    as *partitioning for window work*, not reduction — in Spark that is a
    Window.partitionBy, demonstrated here with rank + partition size."""
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wall = Window.partitionBy("c_nationkey")
    return customer.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rank_in_nation"),
        F.count(F.lit(1)).over(wall).alias("nation_size"),
    ).orderBy("c_custkey")


# --- §2.5 windows ---------------------------------------------------------

@_register(
    "op-window-lag1",
    """
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey), 4) AS prev_totalprice
    FROM orders ORDER BY o_custkey, o_orderkey
    """,
)
def op_window_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag(1) within a keyed ordered series (transformer.py:99)."""
    orders = load_table(spark, sf_dir, "orders")
    w = ordered_window(["o_custkey"], ["o_orderdate", "o_orderkey"])
    return orders.select(
        "o_custkey",
        "o_orderkey",
        lag_feature("o_totalprice", w).alias("prev_totalprice"),
    ).orderBy("o_custkey", "o_orderkey")


@_register(
    "op-window-roll5",
    """
    SELECT o_custkey, o_orderkey,
           CASE WHEN count(o_totalprice) OVER w5 >= 3
                THEN round(avg(o_totalprice) OVER w5, 4) END AS roll5
    FROM orders
    WINDOW w5 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
    """,
)
def op_window_roll5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row trailing mean with the min-periods=3 gate
    (transformer.py:101-105)."""
    orders = load_table(spark, sf_dir, "orders")
    w = ordered_window(["o_custkey"], ["o_orderdate", "o_orderkey"])
    return orders.select(
        "o_custkey",
        "o_orderkey",
        rolling_mean("o_totalprice", w).alias("roll5"),
    ).orderBy("o_custkey", "o_orderkey")


# --- §2.6 sorts / limits / top-k -------------------------------------------

@_register(
    "op-sort-limit-topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def op_sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered LIMIT preview (transformer.py:157-171). Spark plans this as
    TakeOrderedAndProject — a per-partition top-k + driver merge, never a
    full global sort, so it scales to any row count."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
    )


# --- §2.8 scalar functions --------------------------------------------------

@_register(
    "op-scalar-suite",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price_r,
           CAST(l_quantity AS INTEGER) AS qty_int,
           coalesce(nullif(l_returnflag, 'N'), 'none') AS flag_display,
           printf('%.3f', l_discount) AS disc_fmt
    FROM lineitem WHERE l_orderkey % 100 = 0
    ORDER BY l_orderkey, l_linenumber
    """,
)
def op_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's scalar surface (§2.8): round, casts, coalesce
    fallback, display formatting (transformer.py:104-113,173-174)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price_r"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.coalesce(
            F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")
        ).alias("flag_display"),
        F.format_string("%.3f", "l_discount").alias("disc_fmt"),
    ).orderBy("l_orderkey", "l_linenumber")
