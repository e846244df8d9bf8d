"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed via Arrow-batched mapInPandas.

What is REAL here (and tested): the schema contract, the mapInPandas
batch shape (pandas DataFrames in/out, Arrow transfer), partition-size
control for large blobs, and the deterministic feature outputs. What is
STUBBED: the actual media decoding — this container has no image/audio
libraries, so `decode_media` tries the real decoder import and otherwise
produces a DETERMINISTIC FAKE derived from the bytes (clearly labeled in
`decoder` column). Swap `_fake_decode` for a PIL/ffmpeg call and nothing
else changes.

Scale notes: blobs ride in the DataFrame (at 100 TB: parquet binary
columns or pointer columns to object storage). mapInPandas streams
Arrow record batches, so executor memory is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch times the blob size — set
`records_per_batch` small for big media. repartition before the map if
blob sizes are skewed."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("content", T.BinaryType(), nullable=True),
        T.StructField("media_type", T.StringType(), nullable=False),
        T.StructField(
            "meta", T.MapType(T.StringType(), T.StringType()), nullable=True
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decoder", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def binarize_documents(docs: DataFrame) -> DataFrame:
    """Demo media table from the documents fixture: utf-8 bytes as the
    opaque blob (the plumbing doesn't care what the bytes mean)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("media_type"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def _fake_decode(buf: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE decode: pretend dimensions derived from the
    byte content. Stands in for PIL.Image.open(...).size."""
    n = len(buf)
    w = 64 + (n % 577)
    h = 64 + ((n * 31 + (buf[0] if n else 0)) % 449)
    return w, h


def _try_real_decoder():
    try:  # pragma: no cover - decoder libs absent in this container
        from PIL import Image  # noqa: F401

        return "pillow"
    except ImportError:
        return None


def decode_media(media: DataFrame, records_per_batch: int = 256) -> DataFrame:
    """binary blobs -> per-item features via Arrow-batched mapInPandas.
    Pure per-partition map: no shuffle, scales with input splits.

    NOTE the closure below references only locals + pandas: cloudpickle
    then ships it BY VALUE, so executors do not need this package on
    their PYTHONPATH (a module-global reference would make every worker
    import this module)."""
    decoder = _try_real_decoder()
    feature_cols = [f.name for f in FEATURE_SCHEMA]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, mtype, buf in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                buf = bytes(buf) if buf is not None else b""
                if decoder == "pillow":  # pragma: no cover
                    raise NotImplementedError(
                        "real decoder wiring intentionally left to deployment"
                    )
                n = len(buf)
                w = 64 + (n % 577)  # DETERMINISTIC FAKE decode (see above)
                h = 64 + ((n * 31 + (buf[0] if n else 0)) % 449)
                out.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "byte_len": n,
                        "checksum": int(sum(buf) % 997),
                        "width": w,
                        "height": h,
                        "decoder": "fake-deterministic",
                    }
                )
            yield pd.DataFrame(out, columns=feature_cols)

    sized = media.sparkSession.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
    )
    media.sparkSession.conf.set(
        "spark.sql.execution.arrow.maxRecordsPerBatch", str(records_per_batch)
    )
    try:
        return media.select(
            "media_id", "media_type", "content"
        ).mapInPandas(_decode, FEATURE_SCHEMA)
    finally:
        media.sparkSession.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", sized
        )


def sample_frames(
    media: DataFrame, frame_size: int = 64, every_n: int = 4
) -> DataFrame:
    """Frame sampling plumbing: slice each blob into fixed-size 'frames'
    and keep every n-th (a video frame sampler has exactly this shape —
    replace the slicer with a container demuxer). One output row per
    sampled frame."""

    frame_cols = [f.name for f in FRAME_SCHEMA]  # locals-only closure

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(buf) if buf is not None else b""
                n_frames = max(len(buf) // frame_size, 0)
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_no": i,
                            "frame_bytes": buf[
                                i * frame_size : (i + 1) * frame_size
                            ],
                        }
                    )
            yield pd.DataFrame(rows, columns=frame_cols)

    return media.select("media_id", "content").mapInPandas(
        _frames, FRAME_SCHEMA
    )
