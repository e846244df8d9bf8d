"""Multimodal pipeline query: documents -> binary media table ->
Arrow-batched decode/featurize (mapInPandas). The blobs here are utf-8
text bytes, so the DuckDB oracle can recompute every feature from the
text itself (octet_length / per-char codepoints) — checking the whole
mapInPandas path end-to-end, batch shape included."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing end to end (operators/multimodal.py
    sample_frames): every 4th 64-byte frame of each blob. Frames are
    binary, so the hashable surface is their MD5 — the documents are
    ASCII, so DuckDB reproduces the exact frame bytes with substr on
    the text and hashes the same 64 bytes."""
    from data_engineering_pipeline_spark.operators.multimodal import (
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(binarize_documents(docs), frame_size=64, every_n=4)
    return frames.select(
        "media_id",
        "frame_no",
        F.md5("frame_bytes").alias("frame_md5"),
    ).orderBy("media_id", "frame_no")


QUERIES["multimodal-frames"] = multimodal_frames

ORACLES["multimodal-frames"] = """
    WITH b AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) // 64 AS n_frames
      FROM documents
    )
    SELECT media_id,
           CAST(unnest(generate_series(0, CAST(n_frames - 1 AS BIGINT), 4))
                AS INTEGER) AS frame_no,
           md5(substr(text,
                      CAST(unnest(generate_series(0,
                           CAST(n_frames - 1 AS BIGINT), 4)) * 64 + 1
                           AS BIGINT),
                      64)) AS frame_md5
    FROM b WHERE n_frames >= 1
    ORDER BY media_id, frame_no
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail-resize plumbing end to end (operators/multimodal.py
    resize_media): document blobs carry no raster magic, so every row
    exercises the deterministic-fake branch — the Spark surface under
    grade is the mapInPandas batch shape, the strided thumbnail
    derivation, and the md5-hashable binary contract (the REAL
    nearest-neighbor PPM/BMP resample is pinned by unit tests with
    hand-computed pixels, the same split as multimodal-decode)."""
    from data_engineering_pipeline_spark.operators.multimodal import (
        binarize_documents,
        resize_media,
    )
    from data_engineering_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    media = binarize_documents(docs)
    return (
        resize_media(media, out_w=8, out_h=8)
        .select("media_id", "out_w", "out_h", "fmt", "out_len", "out_md5")
        .orderBy("media_id")
    )


QUERIES["multimodal-resize"] = multimodal_resize

# Fake-branch replay: ASCII text == blob bytes, so the strided
# thumbnail body is substr at 1 + i*stride and the md5 is over the
# same P6 header + body string. Header 'P6\n8 8\n255\n' = 11 bytes.
ORACLES["multimodal-resize"] = """
    WITH b AS (
      SELECT doc_id AS media_id, text,
             octet_length(encode(text)) AS n
      FROM documents
    ),
    p AS (
      SELECT media_id, text, n,
             greatest(1, n // 192) AS stride,
             least(192, n) AS cnt
      FROM b
    ),
    ch AS (
      SELECT media_id, i, substr(text, CAST(1 + i * stride AS BIGINT), 1) AS c
      FROM p, UNNEST(range(cnt)) AS t(i)
    ),
    agg AS (
      SELECT media_id, string_agg(c, '' ORDER BY i) AS body
      FROM ch GROUP BY media_id
    )
    SELECT p.media_id,
           CAST(8 AS INTEGER) AS out_w, CAST(8 AS INTEGER) AS out_h,
           'fake' AS fmt,
           CAST(11 + cnt AS BIGINT) AS out_len,
           md5('P6' || chr(10) || '8 8' || chr(10) || '255' || chr(10)
               || coalesce(body, '')) AS out_md5
    FROM p LEFT JOIN agg USING (media_id)
    ORDER BY media_id
"""
