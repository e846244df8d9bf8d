"""Training-corpus export: the write side of a 100 TB curation run.

What matters at scale is LAYOUT, not just bytes: downstream trainers
list partition directories (hive-style `lang=xx/`), want files of a
bounded size (too-large files break work stealing, too-small files
drown the namenode), and need a row-count manifest to audit the export
without re-scanning it. This module writes exactly that:

- hive-partitioned parquet by the given columns,
- `maxRecordsPerFile` bounding every file (Spark splits task output),
- rows sorted within files by the sort key (locality for range reads),
- a `_manifest/` parquet beside the data with per-partition row counts
  and key spans, computed by reading back the WRITTEN bytes — that
  audits what actually landed on disk, and costs one scan of the
  compact output rather than re-executing the (possibly enormous)
  upstream curation lineage a second time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_corpus(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    sort_col: str = "doc_id",
    max_records_per_file: int = 10_000,
) -> DataFrame:
    """Write `df` as a partitioned, size-bounded, sorted corpus export
    and its manifest; returns the manifest DataFrame.

    Scale: one shuffle keyed by the partition columns co-locates each
    hive partition's rows (so each partition dir is written by few
    tasks, not sprayed across all of them), sortWithinPartitions orders
    rows without a global sort, and maxRecordsPerFile caps file size.
    The manifest is one partial-aggregated pass over the same frame."""
    # sort by (partition cols, key): the file writer REQUIRES ordering
    # by the partition columns and inserts its own (non-stable) sort if
    # the stream lacks it, which would scramble the key order; sorting
    # on both satisfies the writer and keeps files key-sorted
    # (an unpartitioned export skips the co-locating shuffle — there is
    # no layout to co-locate)
    shuffled = (
        df.repartition(*[F.col(c) for c in partition_cols])
        if partition_cols
        else df
    )
    (
        shuffled.sortWithinPartitions(*partition_cols, sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )
    # manifest from the WRITTEN data, not the input lineage: audits the
    # bytes on disk and avoids re-running the upstream curation plan
    # explicit schema on the read-back: an EMPTY partitioned write
    # emits no data files and schema inference over that raises — an
    # increment with zero surviving docs must produce an empty
    # manifest, not an AnalysisException
    manifest = (
        df.sparkSession.read.schema(df.schema).parquet(path)
        .groupBy(*partition_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(sort_col).alias("min_key"),
            F.max(sort_col).alias("max_key"),
        )
    )
    manifest.write.mode("overwrite").parquet(f"{path}/_manifest")
    return manifest


def compact_corpus(
    spark,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    sort_col: str = "doc_id",
    target_records_per_file: int = 100_000,
) -> int:
    """Small-file compaction — the maintenance job every long-lived
    corpus needs once incremental appends accumulate: rewrite each hive
    partition's many small files into few sorted ones, atomically
    (write to `<path>.__compact__`, swap dirs, drop the old copy so a
    crash at any point leaves a complete corpus on disk). Returns the
    number of data files after compaction.

    Scale: one shuffle keyed by the partition columns (the same layout
    write as write_corpus); each partition rewrites independently, so
    compaction parallelizes across partitions and never holds more
    than one partition's rows per task."""
    import glob
    import os
    import shutil

    df = spark.read.parquet(path)
    tmp = f"{path}.__compact__"
    # NOT "<path>.__old__": recover_table (operators/upsert.py) sweeps
    # the glob "<path>.__old__*", whose star matches the empty string —
    # it would rmtree/restore a compaction remnant it does not
    # understand if both tools ever touched the same path
    old = f"{path}.__cold__"
    shuffled = (
        df.repartition(*[F.col(c) for c in partition_cols])
        if partition_cols
        else df.coalesce(max(df.rdd.getNumPartitions() // 8, 1))
    )
    (
        shuffled.sortWithinPartitions(*partition_cols, sort_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(tmp)
    )
    # the read skips _-prefixed dirs, so carry the manifest forward
    # explicitly (row counts are unchanged by compaction)
    if os.path.isdir(f"{path}/_manifest"):
        shutil.copytree(f"{path}/_manifest", f"{tmp}/_manifest")
    # recoverable swap (same discipline as operators/upsert.py): the
    # live path is missing only between the two renames, and both the
    # old and new complete copies exist on disk until the final delete
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    # data files live exactly len(partition_cols) hive dirs deep (one
    # `col=value/` level per partition column; zero -> files at the
    # root) — a fixed one-level glob under- or over-counts otherwise
    depth = "/".join(["*"] * len(partition_cols) + ["*.parquet"])
    # exclude files under metadata dirs: at one partition level the
    # glob's * also matches _manifest/, which would overcount the
    # "number of data files" contract by the manifest's part files.
    # Only NON-hive dirs are metadata (ADVICE r8): a blanket
    # '_'/'.'-prefix test silently undercounted a legitimate partition
    # COLUMN whose name begins with an underscore (legal in Spark) —
    # its dirs are `_col=value/`, which the col=value shape admits
    return sum(
        1
        for f in glob.glob(f"{path}/{depth}")
        if all(
            "=" in part
            for part in os.path.relpath(f, path).split(os.sep)[:-1]
        )
    )


def recover_corpus(path: str) -> str:
    """Restore a corpus export to a consistent state after a crash in
    compact_corpus's swap (single-writer). Returns
    'clean' | 'finished_swap' | 'restored_old' | 'dropped_tmp'.
    Mirrors operators/upsert.py recover_table: live present -> drop
    remnants; live missing with a complete compacted copy (_SUCCESS)
    -> finish the swap; else restore the old copy (re-run compaction)."""
    import os
    import shutil

    tmp = f"{path}.__compact__"
    # NOT "<path>.__old__": recover_table (operators/upsert.py) sweeps
    # the glob "<path>.__old__*", whose star matches the empty string —
    # it would rmtree/restore a compaction remnant it does not
    # understand if both tools ever touched the same path
    old = f"{path}.__cold__"
    if os.path.isdir(path):
        found = False
        for d in (tmp, old):
            if os.path.isdir(d):
                shutil.rmtree(d)
                found = True
        return "finished_swap" if found else "clean"
    if os.path.isdir(tmp) and os.path.exists(os.path.join(tmp, "_SUCCESS")):
        os.rename(tmp, path)
        if os.path.isdir(old):
            shutil.rmtree(old)
        return "finished_swap"
    if os.path.isdir(old):
        os.rename(old, path)
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        return "restored_old"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    return "dropped_tmp"
