"""Data-quality report operator — the reference lists data-quality
checks as an acknowledged gap (README1.md 'Next Steps'); here they are a
first-class operator: one pass over the table producing a long-format
metric report per column (completeness, cardinality, range), all
computed in a single aggregation (no per-column jobs).

At 100 TB this is one scan + one 1-row aggregate: every metric is a
column of the same agg, so adding metrics costs nothing extra in IO."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quality_report(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long-format report: (col_name, metric, value: double).
    Metrics: null_ratio, distinct_count, plus min/max for numerics."""
    cols = columns or df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("integer", "long", "double", "float", "short")
    }
    n = F.count(F.lit(1))
    aggs = []
    for c in cols:
        aggs.append(
            (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) / n).alias(
                f"__null__{c}"
            )
        )
        aggs.append(F.countDistinct(c).cast("double").alias(f"__dist__{c}"))
        if c in numeric:
            aggs.append(F.min(c).cast("double").alias(f"__min__{c}"))
            aggs.append(F.max(c).cast("double").alias(f"__max__{c}"))
    wide = df.agg(*aggs)

    metric_cols = []
    for c in cols:
        metric_cols.append((c, "null_ratio", f"__null__{c}"))
        metric_cols.append((c, "distinct_count", f"__dist__{c}"))
        if c in numeric:
            metric_cols.append((c, "min", f"__min__{c}"))
            metric_cols.append((c, "max", f"__max__{c}"))
    structs = F.array(
        *[
            F.struct(
                F.lit(col).alias("col_name"),
                F.lit(metric).alias("metric"),
                F.col(src).alias("value"),
            )
            for col, metric, src in metric_cols
        ]
    )
    return (
        wide.select(F.explode(structs).alias("m"))
        .select("m.col_name", "m.metric", "m.value")
    )
