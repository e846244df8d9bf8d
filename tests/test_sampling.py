"""Deterministic sampling: the same rows must be chosen regardless of
input partitioning (the property df.sample() does NOT have, and the
reason operators/sampling.py exists)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.sampling import (
    hash_sample,
    stratified_sample,
)
from data_engineering_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def _keys(df):
    return sorted(
        (r["l_orderkey"], r["l_linenumber"])
        for r in df.select("l_orderkey", "l_linenumber").collect()
    )


def test_hash_sample_partitioning_invariant(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    a = _keys(hash_sample(li, 10, F.col("l_orderkey"), F.col("l_linenumber")))
    b = _keys(
        hash_sample(
            li.repartition(7, "l_suppkey"),
            10,
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
    )
    assert a == b
    assert len(a) > 0


def test_stratified_sample_exact_per_stratum(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    samp = stratified_sample(
        li, ["l_returnflag"], 1, F.col("l_orderkey"), F.col("l_linenumber")
    )
    got = {
        r["l_returnflag"]: r["n"]
        for r in samp.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["l_returnflag"]: -(-r["n"] // 100)  # ceil(n / 100)
        for r in li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_stratified_sample_partitioning_invariant(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    a = _keys(
        stratified_sample(
            li, ["l_returnflag"], 1, F.col("l_orderkey"), F.col("l_linenumber")
        )
    )
    b = _keys(
        stratified_sample(
            li.repartition(11, "l_partkey"),
            ["l_returnflag"],
            1,
            F.col("l_orderkey"),
            F.col("l_linenumber"),
        )
    )
    assert a == b
