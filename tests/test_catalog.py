"""Ad-hoc SQL surface: register_views makes every testdata table
queryable with arbitrary spark.sql text (the reference's own interface
is SQL strings, transformer.py:59-72)."""

from __future__ import annotations

from data_engineering_pipeline_spark.sources.catalog import register_views

SF_DIR = "/root/testdata/sf0.001"


def test_adhoc_sql_over_registered_views(spark):
    names = register_views(spark, SF_DIR)
    assert "lineitem" in names and "events" in names

    row = spark.sql(
        """
        SELECT n.n_name, count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n_orders DESC, n_name LIMIT 1
        """
    ).collect()[0]
    assert row["n_orders"] > 0

    # events' nanos timestamps must be usable from plain SQL too
    n = spark.sql(
        "SELECT count(*) AS n FROM events WHERE ts >= TIMESTAMP '2024-01-05'"
    ).collect()[0]["n"]
    assert n > 0


def test_register_views_is_idempotent(spark):
    register_views(spark, SF_DIR)
    before = spark.sql("SELECT count(*) FROM documents").collect()[0][0]
    register_views(spark, SF_DIR)
    after = spark.sql("SELECT count(*) FROM documents").collect()[0][0]
    assert before == after
