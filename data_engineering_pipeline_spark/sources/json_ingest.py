"""Flatten + validate + quarantine for ingested nested JSON records
(op-json-extract, op-validate-cast, op-filter-dict, op-lit-now;
reference database.py:86-113).

The reference flattens each record in Python, skipping rows with missing
iso3/year and warning on uncastable years. Here both paths are one
DataFrame expression each: `flatten_wb_records` produces the raw-layer
shape; `split_valid` partitions it into (valid, quarantine) with a
try_cast (Spark 4 ANSI mode would raise on a plain cast — try_cast gives
the reference's null-then-skip semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_wb_records(
    df: DataFrame,
    indicator_fallback_id: str | None = None,
    fetched_at: dt.datetime | None = None,
) -> DataFrame:
    """Nested record -> flat raw-layer row (database.py:96-102):
    iso3 falls back from countryiso3code to country.id; year is the raw
    string `date` (validated downstream); one batch timestamp
    (database.py:93 stamps a single now() per batch — pass `fetched_at`
    for exact parity, else current_timestamp())."""
    ts = F.lit(fetched_at) if fetched_at else F.current_timestamp()
    return df.select(
        F.coalesce(F.col("countryiso3code"), F.col("country.id")).alias(
            "country_iso3"
        ),
        F.col("country.value").alias("country_name"),
        F.col("date").alias("year_str"),
        F.col("value").alias("value"),
        F.coalesce(
            F.col("indicator.id"),
            F.lit(indicator_fallback_id) if indicator_fallback_id else F.lit(None),
        ).alias("indicator_id"),
        F.col("indicator.value").alias("indicator_name"),
        ts.alias("fetched_at"),
    )


def split_valid(flat: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine) split (database.py:104-111): a row is valid
    when iso3 is present/non-empty and year casts to int. The quarantine
    side keeps the original year_str plus a reason, for the logged-skip
    behavior (the reference logs and drops; we keep the rows auditable)."""
    casted = flat.withColumn("year", F.col("year_str").try_cast("int"))
    ok = (
        F.col("country_iso3").isNotNull()
        & (F.col("country_iso3") != "")
        & F.col("year").isNotNull()
    )
    valid = casted.filter(ok).select(
        "country_iso3",
        "country_name",
        "year",
        "value",
        "indicator_id",
        "indicator_name",
        "fetched_at",
    )
    quarantine = casted.filter(~ok).withColumn(
        "reason",
        F.when(
            F.col("country_iso3").isNull() | (F.col("country_iso3") == ""),
            F.lit("missing_iso3"),
        ).otherwise(F.lit("bad_year")),
    )
    return valid, quarantine
