"""op-sink-ddl: declared external tables are created idempotently and
serve reads/writes by name."""

from __future__ import annotations

from data_engineering_pipeline_spark.schemas import RAW_INDICATOR_SCHEMA
from data_engineering_pipeline_spark.sources.ddl import (
    create_table_if_not_exists,
    drop_table,
)


def test_create_if_not_exists_idempotent(spark, tmp_path):
    path = str(tmp_path / "raw_gdp")
    try:
        assert create_table_if_not_exists(
            spark, "raw_gdp_growth_t", RAW_INDICATOR_SCHEMA, path
        )
        # second create is a no-op (database.py:31 IF NOT EXISTS)
        assert not create_table_if_not_exists(
            spark, "raw_gdp_growth_t", RAW_INDICATOR_SCHEMA, path
        )
        got = spark.table("raw_gdp_growth_t")
        assert [f.name for f in got.schema.fields] == [
            f.name for f in RAW_INDICATOR_SCHEMA.fields
        ]
        assert got.count() == 0
    finally:
        drop_table(spark, "raw_gdp_growth_t")
