"""Explicit StructTypes for every layer the engine touches.

The reference declares fixed DDL schemas (database.py:31-55,
transformer.py:37-51); we do the same with StructTypes. Per SURVEY.md §1.2
the NUMERIC(10,4) metrics become DoubleType (the reference computes in
Python float, so double semantics reproduce its math; DecimalType would
not).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference-parity panel layer (raw_gdp_growth / raw_unemployment;
# reference DDL at database.py:31-55, SERIAL id dropped) ---
RAW_INDICATOR_SCHEMA = T.StructType(
    [
        T.StructField("country_iso3", T.StringType(), nullable=False),
        T.StructField("country_name", T.StringType(), nullable=True),
        T.StructField("year", T.IntegerType(), nullable=False),
        T.StructField("value", T.DoubleType(), nullable=True),
        T.StructField("indicator_id", T.StringType(), nullable=True),
        T.StructField("indicator_name", T.StringType(), nullable=True),
        T.StructField("fetched_at", T.TimestampType(), nullable=False),
    ]
)

# --- Cleaned layer (reference DDL at transformer.py:37-51) ---
CLEANED_SCHEMA = T.StructType(
    [
        T.StructField("country_iso3", T.StringType(), nullable=False),
        T.StructField("country_name", T.StringType(), nullable=True),
        T.StructField("year", T.IntegerType(), nullable=False),
        T.StructField("gdp_growth", T.DoubleType(), nullable=True),
        T.StructField("unemployment", T.DoubleType(), nullable=True),
        T.StructField("gdp_growth_lag1", T.DoubleType(), nullable=True),
        T.StructField("gdp_growth_roll5", T.DoubleType(), nullable=True),
        T.StructField("unemp_roll5", T.DoubleType(), nullable=True),
        T.StructField("cleaned_at", T.TimestampType(), nullable=False),
    ]
)

# --- Ingestion JSON record shape (api_fetcher.py:74, database.py:96-113):
# nested {indicator:{id,value}, country:{id,value}, countryiso3code, date,
# value}; `date` arrives as a string, `value` may be JSON null. ---
WB_RECORD_SCHEMA = T.StructType(
    [
        T.StructField(
            "indicator",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("value", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "country",
            T.StructType(
                [
                    T.StructField("id", T.StringType()),
                    T.StructField("value", T.StringType()),
                ]
            ),
        ),
        T.StructField("countryiso3code", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

# --- Driver testdata tables (FIXTURES.md §A) ---
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
