"""Skew/layout utilities: salted results must equal unsalted results;
bucketed joins must plan without an exchange on the join key; partitioned
layouts must prune partitions in the scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.skew import (
    salted_agg,
    salted_join,
    write_bucketed,
    write_partitioned,
)
from data_engineering_pipeline_spark.sources import load_table


def test_salted_agg_equals_plain_agg(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem")
    plain = {
        r.l_returnflag: (r.n, round(r.qty, 4))
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"))
        .collect()
    }
    salted = {
        r.l_returnflag: (r.n, round(r.qty, 4))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            [F.count(F.lit(1)).alias("c"), F.sum("l_quantity").alias("s")],
            [F.sum("c").alias("n"), F.sum("s").alias("qty")],
        ).collect()
    }
    assert salted == plain


def test_salted_join_equals_plain_join(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey"
    )
    cust = load_table(spark, sf_smoke, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name"
    )
    plain = {
        (r.o_orderkey, r.c_name)
        for r in orders.join(cust, "custkey").collect()
    }
    salted = {
        (r.o_orderkey, r.c_name)
        for r in salted_join(orders, cust, "custkey").collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_shuffle_on_key(spark, sf_smoke, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, sf_smoke, "orders")
        cust = load_table(spark, sf_smoke, "customer")
        write_bucketed(orders, "orders_b", "o_custkey", 4)
        write_bucketed(cust, "cust_b", "c_custkey", 4)
        joined = spark.table("orders_b").join(
            spark.table("cust_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: SortMergeJoin directly over the bucketed scans,
        # no Exchange hashpartitioning on the join keys
        assert "SortMergeJoin" in plan
        assert "hashpartitioning(o_custkey" not in plan
        assert joined.count() == orders.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_partitioned_write_prunes(spark, sf_smoke, tmp_path):
    path = str(tmp_path / "orders_by_status")
    orders = load_table(spark, sf_smoke, "orders")
    write_partitioned(orders, path, ["o_orderstatus"])
    scan = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    expected = orders.filter(F.col("o_orderstatus") == "F").count()
    assert scan.count() == expected


def test_dynamic_partition_pruning_on_partitioned_corpus(spark, sf_smoke, tmp_path):
    """Joining a hive-partitioned fact against a selectively-filtered
    dimension must plan a dynamicpruning subquery on the partition
    column: at 100 TB the fact scan then reads only the partitions the
    dim filter selects, discovered at RUNTIME — no hand-written
    partition predicate needed."""
    path = str(tmp_path / "dpp_corpus")
    docs = load_table(spark, sf_smoke, "documents")
    write_partitioned(docs, path, ["lang"])
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("de", 1.0), ("fr", 0.5), ("en", 0.1)], "lang string, w double"
    ).filter(F.col("w") > 0.7)
    j = fact.join(dim, "lang").select("doc_id", "lang")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    expected = docs.filter(F.col("lang") == "de").count()
    assert j.count() == expected > 0
