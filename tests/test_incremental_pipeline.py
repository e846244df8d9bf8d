"""End-to-end incremental curation: the composition a production corpus
pipeline actually runs per arriving batch — quality filter -> dedup
against everything already ingested (no corpus re-scan) -> redact ->
export with manifest — wired from the registered operators and asserted
batch-over-batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.dedup import (
    incremental_minhash_dedup,
)
from data_engineering_pipeline_spark.operators.text import redact_pii
from data_engineering_pipeline_spark.sources import load_table
from data_engineering_pipeline_spark.sources.corpus_sink import write_corpus


def _curate_batch(batch, sigs):
    """quality gate -> incremental near-dedup -> PII scrub.
    Returns (kept_df, updated_signatures)."""
    from data_engineering_pipeline_spark.operators.text import tokens

    ok = batch.filter(F.size(tokens("text")) >= 10)
    sigs, dups = incremental_minhash_dedup(ok, sigs)
    # drop the NEW doc of every duplicate pair (keep earliest ingested)
    drop = dups.select(F.col("id_b").alias("doc_id")).distinct()
    kept = ok.join(drop, "doc_id", "left_anti").select(
        "doc_id", "lang", redact_pii("text").alias("text")
    )
    return kept, sigs


def test_incremental_batches_converge_to_batch_dedup(spark, sf_smoke, tmp_path):
    docs = load_table(spark, sf_smoke, "documents")
    b1 = docs.filter(F.col("doc_id") < 250)
    b2 = docs.filter(F.col("doc_id") >= 250)

    kept1, sigs = _curate_batch(b1, None)
    sigs = sigs.localCheckpoint(eager=True)  # "persisted" state
    kept2, sigs = _curate_batch(b2, sigs)

    ids_inc = sorted(
        r["doc_id"]
        for df in (kept1, kept2)
        for r in df.select("doc_id").collect()
    )

    # one-shot reference: same filter + same dedup over the full corpus
    from data_engineering_pipeline_spark.operators.text import tokens

    ok_all = docs.filter(F.size(tokens("text")) >= 10)
    _, dups_all = incremental_minhash_dedup(ok_all, None)
    drop_all = {r["id_b"] for r in dups_all.select("id_b").collect()}
    ids_ref = sorted(
        r["doc_id"]
        for r in ok_all.select("doc_id").collect()
        if r["doc_id"] not in drop_all
    )
    # batch-2 docs can never evict batch-1 docs (dedup keeps earliest),
    # so incremental == one-shot exactly
    assert ids_inc == ids_ref
    assert len(ids_inc) < docs.count()  # the corpus does contain dups

    # export the curated union and audit the manifest
    curated = kept1.unionByName(kept2)
    manifest = write_corpus(
        curated, str(tmp_path / "out"), ("lang",), "doc_id"
    )
    assert (
        sum(r["n_rows"] for r in manifest.collect())
        == len(ids_inc)
        == spark.read.parquet(str(tmp_path / "out")).count()
    )


def test_replayed_batch_does_not_duplicate_signature_state(spark, sf_smoke):
    """At-least-once replay: re-running a batch whose signatures already
    landed in the store must leave the store unchanged (same rows, same
    count) — otherwise every replay permanently fans out future
    candidate joins."""
    docs = load_table(spark, sf_smoke, "documents").limit(100)
    sigs1, _ = incremental_minhash_dedup(docs, None)
    sigs1 = sigs1.localCheckpoint(eager=True)
    n1 = sigs1.count()
    ids1 = sorted(r["doc_id"] for r in sigs1.select("doc_id").collect())

    # replay the SAME batch against the committed state
    sigs2, _ = incremental_minhash_dedup(docs, sigs1)
    assert sigs2.count() == n1
    assert sorted(r["doc_id"] for r in sigs2.select("doc_id").collect()) == ids1

    # and a mixed batch (half replayed, half new) appends only the new
    more = load_table(spark, sf_smoke, "documents").filter(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 150)
    )
    sigs3, _ = incremental_minhash_dedup(more, sigs1)
    assert sigs3.count() == n1 + 50
    assert sigs3.select("doc_id").distinct().count() == 150
