"""Multimodal plumbing tests: Arrow batch shape, frame sampling slices,
and determinism of the fake decode (the real decoder is a deployment
swap; the Spark-side contract is what's under test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.multimodal import (
    binarize_documents,
    decode_media,
    sample_frames,
)
from data_engineering_pipeline_spark.sources import load_table


def test_decode_features_match_bytes(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    media = binarize_documents(docs)
    feats = {r.media_id: r for r in decode_media(media).collect()}
    for row in docs.collect():
        buf = row.text.encode("utf-8")
        f = feats[row.doc_id]
        assert f.byte_len == len(buf)
        assert f.checksum == sum(buf) % 997
        assert f.width == 64 + (len(buf) % 577)
        assert f.decoder == "fake-deterministic"


def test_frame_sampling_slices_and_strides(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").filter(F.col("doc_id") < 5)
    frames = sample_frames(
        binarize_documents(docs), frame_size=64, every_n=4
    ).collect()
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert frames
    for fr in frames:
        buf = texts[fr.media_id]
        assert fr.frame_no % 4 == 0
        start = fr.frame_no * 64
        assert bytes(fr.frame_bytes) == buf[start : start + 64]
