"""File-format sources: CSV/JSON corrupt-record quarantine, roundtrips,
layout-aware writes; JDBC option assembly."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from data_engineering_pipeline_spark.sources.formats import (
    read_csv,
    read_jsonl,
    split_corrupt,
    write_table,
)
from data_engineering_pipeline_spark.sources.jdbc import jdbc_read_options

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_csv_quarantines_malformed_rows(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,2.5\n"
        "not-an-int,beta,3.5\n"  # bad id -> corrupt
        "3,gamma,4.5\n"
    )
    clean, quarantine = split_corrupt(read_csv(spark, str(p), SCHEMA))
    rows = {r.id: (r.name, r.score) for r in clean.collect()}
    assert rows == {1: ("alpha", 2.5), 3: ("gamma", 4.5)}
    bad = quarantine.collect()
    assert len(bad) == 1 and "not-an-int" in bad[0].raw


def test_jsonl_quarantines_malformed_rows(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "alpha", "score": 2.5}\n'
        "this is not json\n"
        '{"id": 3, "name": "gamma", "score": 4.5}\n'
    )
    clean, quarantine = split_corrupt(read_jsonl(spark, str(p), SCHEMA))
    assert {r.id for r in clean.collect()} == {1, 3}
    assert quarantine.count() == 1


def test_write_table_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)], "id int, g string, v double"
    )
    out = str(tmp_path / "out")
    write_table(df, out, partition_cols=["g"], max_records_per_file=1000)
    back = spark.read.parquet(out)
    assert back.count() == 3
    assert set(back.columns) == {"id", "g", "v"}


def test_jdbc_options_partitioned():
    opts = jdbc_read_options(
        url="jdbc:postgresql://localhost/db",
        table="raw_gdp_growth",
        partition_column="id",
        lower_bound=0,
        upper_bound=100000,
        num_partitions=16,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["fetchsize"] == "10000"


def test_jdbc_options_require_bounds():
    with pytest.raises(ValueError):
        jdbc_read_options(
            url="jdbc:postgresql://localhost/db",
            table="t",
            partition_column="id",
        )
