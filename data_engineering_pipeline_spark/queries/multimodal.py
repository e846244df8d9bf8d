"""Multimodal pipeline query: documents -> binary media table ->
Arrow-batched decode/featurize (mapInPandas). The blobs here are utf-8
text bytes, so the DuckDB oracle can recompute every feature from the
text itself (octet_length / per-char codepoints) — checking the whole
mapInPandas path end-to-end, batch shape included."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_engineering_pipeline_spark.operators.multimodal import (
    binarize_documents,
    decode_media,
)
from data_engineering_pipeline_spark.sources import load_table

QUERIES = {}
ORACLES = {}


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_media(binarize_documents(docs)).orderBy("media_id")


QUERIES["multimodal-decode"] = multimodal_decode

# Documents are ASCII, so utf-8 byte values == codepoints: the oracle
# rebuilds byte_len/checksum/fake-decode dims from the text directly.
ORACLES["multimodal-decode"] = """
    WITH b AS (
      SELECT doc_id AS media_id,
             'application/octet-stream' AS media_type,
             octet_length(encode(text)) AS byte_len,
             CAST(list_sum(list_transform(string_split(text, ''),
                                     c -> ascii(c))) % 997 AS BIGINT) AS checksum,
             ascii(substr(text, 1, 1)) AS first_byte
      FROM documents
    )
    SELECT media_id, media_type, byte_len, checksum,
           CAST(64 + (byte_len % 577) AS INTEGER) AS width,
           CAST(64 + ((byte_len * 31 + first_byte) % 449) AS INTEGER)
             AS height,
           CAST(NULL AS INTEGER) AS channels,
           CAST(NULL AS INTEGER) AS sample_rate,
           CAST(NULL AS BIGINT) AS n_samples,
           CAST(NULL AS DOUBLE) AS mean_val,
           'fake-deterministic' AS decoder
    FROM b ORDER BY media_id
"""
