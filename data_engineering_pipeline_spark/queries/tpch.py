"""Headline analytical queries (TPC-H-shaped, adapted to the testdata
schema — FIXTURES.md lacks some canonical columns, e.g. o_shippriority,
so q3 groups on o_orderpriority instead).

These are the bench workload: scan-heavy aggregation (q1), selective
filter-aggregate (q6), a 3-table join top-k (q3), and a 6-table join (q5).
Money sums are rounded to 2 dp in both engines — double summation order
differs across engines, and 2 dp leaves ~100x margin over accumulated
error at the correctness scale factor.

Scale notes: q1/q6 are pure map-side partial aggregation over the fact
table — they scale linearly and shuffle only grouped partials. q3/q5
broadcast every dimension side (customer/supplier/nation/region), so the
only shuffles are the final group-bys on small key spaces; at 100 TB the
orders side of q3/q5 would also be broadcast-joined or shuffled by AQE
depending on its post-filter size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.queries._exact import (
    mean_int_round4,
    mean_money_round4,
)
from data_engineering_pipeline_spark.sources import load_table

QUERIES = {}
ORACLES = {}

# Cross-engine-exact money arithmetic: the money/rate SOURCE columns are
# 2-dp decimals stored as doubles, so casting each COLUMN to decimal
# recovers the intended exact value identically in Spark and DuckDB
# (casting a derived double product does NOT — Spark's double->decimal
# goes through the shortest string representation, DuckDB uses the exact
# binary value, and they disagree in the last decimal). All products and
# sums then happen in decimal — exact and associative — so summation
# order cannot move a result across the final 2-dp round boundary.

def _dec(col: str, typ: str = "decimal(12,2)"):
    return F.col(col).cast(typ)


def _disc_price_dec():
    """(l_extendedprice * (1 - l_discount)) in exact decimal, scale 4."""
    return (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(3,2)") - _dec("l_discount", "decimal(4,2)"))
    ).cast("decimal(18,4)")


def _money_sum(col):
    # round while still in decimal (exact halves like x.x350 are common
    # in scale-4 money sums and both engines round decimal halves UP for
    # positives), THEN cast to double — rounding after the cast sits on
    # a lossy double and the engines disagree.
    return F.round(F.sum(col), 2).cast("double")


DISC_PRICE_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))"
    " AS DECIMAL(18,4))"
)


def _money_sum_sql(expr: str) -> str:
    return f"CAST(round(sum({expr}), 2) AS DOUBLE)"



def _register(name: str, oracle: str):
    def deco(fn):
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


@_register(
    "q1-pricing-summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
                 AS DOUBLE) AS sum_base_price,
           CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS sum_disc_price,
           CAST(round(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
                 AS DECIMAL(18,4))
                 * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2)
                 AS DOUBLE) AS sum_charge,
           floor((CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) * 20000
                  + count(*)) / (count(*) * 2)) / 10000.0 AS avg_qty,
           floor((CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                    * 100 AS BIGINT)) AS BIGINT) * 200 + count(*))
                 / (count(*) * 2)) / 10000.0 AS avg_price,
           floor((CAST(sum(CAST(CAST(l_discount AS DECIMAL(4,2))
                    * 100 AS BIGINT)) AS BIGINT) * 200 + count(*))
                 / (count(*) * 2)) / 10000.0 AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _disc_price_dec()
    charge = disc_price * (
        F.lit(1).cast("decimal(3,2)") + _dec("l_tax", "decimal(4,2)")
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            _money_sum(_dec("l_extendedprice")).alias("sum_base_price"),
            _money_sum(disc_price).alias("sum_disc_price"),
            _money_sum(charge).alias("sum_charge"),
            mean_int_round4("l_quantity").alias("avg_qty"),
            mean_money_round4("l_extendedprice").alias("avg_price"),
            mean_money_round4("l_discount", typ="decimal(4,2)").alias(
                "avg_disc"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@_register(
    "q3-shipping-priority",
    """
    SELECT l.l_orderkey,
           CAST(round(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))
                 AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
        .join(
            orders.filter(
                F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(
            F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _money_sum(_disc_price_dec()).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@_register(
    "q5-local-supplier-volume",
    """
    SELECT n.n_name,
           CAST(round(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            _money_sum(_disc_price_dec()).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@_register(
    "q6-forecast-revenue",
    """
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE)
             AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        _money_sum(
            _dec("l_extendedprice") * _dec("l_discount", "decimal(4,2)")
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@_register(
    "q7-volume-shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           CAST(round(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE n1.n_name <> n2.n_name
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-border trade volume per (supplier nation, customer nation,
    year) — q7 shape. Both nation sides broadcast under different
    aliases."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            _money_sum(_disc_price_dec()).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@_register(
    "q10-returned-items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue — q10 shape."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            _money_sum(_disc_price_dec()).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "q14-promo-revenue",
    """
    SELECT round(
             100.0 * CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                   THEN CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                        * (CAST(1 AS DECIMAL(3,2))
                           - CAST(l.l_discount AS DECIMAL(4,2)))
                        AS DECIMAL(18,4))
                   ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2))
                      - CAST(l.l_discount AS DECIMAL(4,2)))
                   AS DECIMAL(18,4))) AS DOUBLE), 4)
             AS promo_share_pct,
           count(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-06-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotional revenue share — q14 shape (conditional aggregation
    over a broadcast dimension join)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    disc = _disc_price_dec()
    promo = F.when(F.col("p_type").like("PROMO%"), disc).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-06-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                4,
            ).alias("promo_share_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
