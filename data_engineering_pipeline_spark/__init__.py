"""data_engineering_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the data-processing
capabilities of the reference pipeline (Teekay7000/data-engineering-pipeline:
REST ingest -> raw layer -> join/clean/feature-engineer -> cleaned layer),
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).

Design stance (SURVEY.md §7.0): DataFrames + built-in expressions
everywhere; lazy single-job pipelines; Parquet tables; Catalyst/AQE do the
optimization. Pandas UDFs only where built-ins genuinely can't express the
semantics.
"""

__version__ = "0.1.0"
