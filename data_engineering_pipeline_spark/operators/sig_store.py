"""Band-bucketed MinHash signature store for incremental near-dup.

The flat store (streaming/sinks.py `_append_parquet` on one directory)
re-reads and RE-BANDS every signature row per batch: BASELINE addendum
56 measured that probe as the delta path's worst scaler (8.6x per 10x
of corpus — 45.4 s at the 500k decade), and addendum 57's slim banding
only cut the shuffle volume, not the O(corpus) read + re-band.

This store persists TWO pruned layouts under one root:

  <root>/banded/band=B/bpfx=NN/app-*.parquet   (id, bucket)
  <root>/sigs/pfx=NN/app-*.parquet             (id, mh_0..mh_{K-1})
  <root>/_meta.json                            structural params

- `banded` holds the LSH band buckets ONCE (computed at commit time,
  never re-derived from the mh columns), hive-partitioned by band and
  a bucket-hash prefix: a batch's probe lists the (band, bpfx) dirs
  its own band buckets hash into and opens ONLY those — for a small
  batch (the streaming steady state, and any batch at the 100 TB
  corpus/batch ratio) most of the store is never listed, and even a
  bucket-saturating batch reads 3 slim columns instead of the K+1
  signature columns. The probe side of the candidate join broadcasts
  the batch (bounded: 8 x batch rows x 3 longs), so the store side is
  a pruned SCAN, never a shuffle.
- `sigs` holds the K-column signatures for the verify stage and the
  replay anti-join, partitioned by an id-hash prefix so both reads
  prune to the prefixes of the ids actually being looked up.

Append discipline is the sinks' move-files-in contract (O(batch),
prior files never rewritten). Crash windows converge exactly like the
flat store: fresh rows are re-derived by the keys-only anti-join
against `sigs`, so a partial append is healed by the replay. commit()
moves `banded` files BEFORE `sigs` files — the one fatal order is a
signature landing without its band rows (the doc would never be
probed again); banded-without-sigs merely re-appends duplicate band
rows on replay, which the candidate `distinct()` absorbs.

Structural parameters (num_hashes, bands, shingle n, prefix moduli)
are stamped into `_meta.json` and validated on open — the same
layout-version discipline as refresh_shards' hash stamp: state built
under different banding must not be probed incrementally.

Semantics are IDENTICAL to operators/dedup.py
incremental_minhash_dedup (same shingles, signatures, banding structs,
estimator, threshold rule) — pinned by the store-vs-flat parity test.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_META = "_meta.json"
_LAYOUT_VERSION = "banded-v1"


class BandedSignatureStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        n: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        sig_pfx: int = 32,
        bucket_pfx: int = 32,
    ):
        self.spark = spark
        self.root = root
        self.id_col = id_col
        self.text_col = text_col
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.sig_pfx = sig_pfx
        self.bucket_pfx = bucket_pfx
        self._sigs = os.path.join(root, "sigs")
        self._banded = os.path.join(root, "banded")
        self._check_meta()
        # heal staging dirs left by a crashed commit (replay re-stages)
        for d in glob.glob(os.path.join(root, ".stage-*")):
            shutil.rmtree(d, ignore_errors=True)
        # heal a crashed compact(): its swap window is rename(base ->
        # aside) then rename(stage -> base) — dying between the two
        # leaves the live dir MISSING with the aside holding the only
        # copy. Restore the aside when base is gone; staged compacts
        # are garbage either way (a rerun re-stages).
        for base in (self._banded, self._sigs):
            asides = sorted(glob.glob(base + ".old-*"))
            if not os.path.isdir(base) and asides:
                os.rename(asides.pop(0), base)
            for d in asides:
                shutil.rmtree(d, ignore_errors=True)
            for d in glob.glob(base + ".compact-*"):
                shutil.rmtree(d, ignore_errors=True)

    # ---------------------------------------------------------- meta
    def _meta_dict(self) -> dict:
        return {
            "layout": _LAYOUT_VERSION,
            "n": self.n,
            "num_hashes": self.num_hashes,
            "bands": self.bands,
            "sig_pfx": self.sig_pfx,
            "bucket_pfx": self.bucket_pfx,
        }

    def _check_meta(self) -> None:
        mp = os.path.join(self.root, _META)
        if os.path.exists(mp):
            with open(mp) as fh:
                have = json.load(fh)
            if have != self._meta_dict():
                raise ValueError(
                    "signature store %s was built with %r, opened "
                    "with %r — banding/layout params are structural; "
                    "rebuild the store instead of probing across them"
                    % (self.root, have, self._meta_dict())
                )

    def _write_meta(self) -> None:
        mp = os.path.join(self.root, _META)
        if os.path.exists(mp):
            return
        os.makedirs(self.root, exist_ok=True)
        tmp = mp + "." + uuid.uuid4().hex[:8] + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._meta_dict(), fh)
        os.rename(tmp, mp)

    # -------------------------------------------------------- layout
    def exists(self) -> bool:
        return _dir_has_parquet(self._sigs)

    def _pfx_expr(self, col):
        return F.pmod(F.xxhash64(col), F.lit(self.sig_pfx))

    def _sig_dirs(self, prefixes: list[int] | None) -> list[str]:
        return _partition_dirs(self._sigs, {"pfx": prefixes})

    def _banded_dirs(self, pairs: set[tuple[int, int]] | None) -> list[str]:
        dirs = []
        for band_dir in sorted(glob.glob(os.path.join(self._banded, "band=*"))):
            band = int(os.path.basename(band_dir).split("=", 1)[1])
            for pd in sorted(glob.glob(os.path.join(band_dir, "bpfx=*"))):
                bpfx = int(os.path.basename(pd).split("=", 1)[1])
                if pairs is None or (band, bpfx) in pairs:
                    dirs.append(pd)
        return dirs

    def _read(self, base: str, dirs: list[str], like: DataFrame,
              cols: list[str]) -> DataFrame:
        """Read the selected partition dirs (basePath keeps partition
        columns parsing); empty selection -> typed empty frame."""
        dirs = [d for d in dirs if _dir_has_parquet(d)]
        if not dirs:
            return like.select(*cols).limit(0)
        return (
            self.spark.read.option("basePath", base)
            .parquet(*dirs)
            .select(*cols)
        )

    # --------------------------------------------------------- probe
    def seen_ids(self, ids: DataFrame) -> DataFrame:
        """Store ids restricted to the prefixes of `ids` — the pruned
        form of `existing.select(id_col)` for anti-joins. Any store id
        equal to a probe id shares its prefix, so the restriction is
        exact."""
        if not self.exists():
            return ids.select(self.id_col).limit(0)
        pfx = sorted(
            r[0]
            for r in ids.select(
                self._pfx_expr(F.col(self.id_col)).alias("p")
            ).distinct().collect()
        )
        return self._read(
            self._sigs, self._sig_dirs(pfx), ids.select(self.id_col),
            [self.id_col],
        )

    def probe(
        self,
        new_docs: DataFrame,
        threshold: float = 0.7,
        assume_fresh: bool = False,
        stats: dict | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """(fresh_sig, dup_pairs) for a batch against the store —
        the exact incremental_minhash_dedup semantics with pruned
        reads. `assume_fresh=True` skips the store anti-join when the
        caller already removed seen ids (the curation pipeline does).
        `stats`, if given, receives the file-open witness counters."""
        from data_engineering_pipeline_spark.operators.dedup import (
            _band_rows,
            _band_structs,
            minhash_signature,
            shingle_sets,
        )

        id_col = self.id_col
        rows = _band_rows(self.num_hashes, self.bands)
        band_cols = _band_structs(self.bands, rows)
        mh_cols = [f"mh_{i}" for i in range(self.num_hashes)]

        ex = shingle_sets(new_docs, id_col, self.text_col, self.n).select(
            F.col(id_col), F.explode("shingles").alias("shingle")
        )
        # checkpoint the batch signatures ONCE: sig feeds the fresh
        # anti-join, the banding, the verify lookup AND the caller's
        # commit — without the checkpoint every one of those actions
        # re-runs the shingle explode + minhash aggregation (and the
        # caller's whole new_docs lineage above it); the r11 500k
        # probe measured that recomputation as the dominant wall
        sig = minhash_signature(ex, id_col, self.num_hashes).localCheckpoint(
            eager=False
        )
        if assume_fresh or not self.exists():
            fresh_sig = sig
        else:
            # no broadcast hint: the seen side is pruned-store-sized
            # (batch-sized only when prefixes are selective) — AQE
            # picks the strategy from the pruned size at runtime
            fresh_sig = sig.join(
                self.seen_ids(sig.select(id_col)), id_col, "left_anti"
            ).localCheckpoint(eager=False)

        def banded(df: DataFrame) -> DataFrame:
            return df.select(
                F.col(id_col),
                F.explode(F.array(*band_cols)).alias("bb"),
            ).select(
                id_col,
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"),
            )

        # the batch's band buckets name the ONLY store partitions a
        # candidate can live in: bpfx is a pure function of bucket and
        # the join requires bucket equality
        batch_banded = banded(sig).localCheckpoint(eager=False)
        touched = {
            (r["band"], r["bp"])
            for r in batch_banded.select(
                "band",
                F.pmod(F.col("bucket"), F.lit(self.bucket_pfx)).alias("bp"),
            ).distinct().collect()
        }
        sel = self._banded_dirs(touched)
        if stats is not None:
            allb = self._banded_dirs(None)
            stats["banded_dirs_opened"] = len(
                [d for d in sel if _dir_has_parquet(d)]
            )
            stats["banded_dirs_total"] = len(allb)
            stats["banded_files_opened"] = sum(
                _n_parquet(d) for d in sel
            )
            stats["banded_files_total"] = sum(
                _n_parquet(d) for d in allb
            )
        store_banded = self._read(
            self._banded, sel, batch_banded, [id_col, "band", "bucket"]
        )
        # store rows outside the touched buckets can never satisfy the
        # bucket-equality join — the pruned union is exact
        all_banded = store_banded.unionByName(banded(fresh_sig))
        # no broadcast hint on the batch side: for a micro-batch AQE
        # broadcasts it anyway (batch_banded is checkpointed, so its
        # size is exact at runtime), while a bootstrap probe of a
        # whole corpus through an empty store would otherwise
        # driver-collect millions of banded rows into a forced
        # broadcast (the r11 500k rebuild measured minutes for it)
        a = batch_banded.alias("a")
        b = all_banded.alias("b")
        cand = (
            a
            .join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
            )
            .select(
                F.least(
                    F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
                ).alias("id_a"),
                F.greatest(
                    F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
                ).alias("id_b"),
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        cand_pfx = sorted(
            r[0]
            for r in cand.select(
                F.explode(
                    F.array(
                        self._pfx_expr(F.col("id_a")),
                        self._pfx_expr(F.col("id_b")),
                    )
                ).alias("p")
            ).distinct().collect()
        )
        lookup = self._read(
            self._sigs, self._sig_dirs(cand_pfx), sig,
            [id_col] + mh_cols,
        ).unionByName(fresh_sig.select(id_col, *mh_cols))
        sa = lookup.select(
            F.col(id_col).alias("id_a"),
            *[F.col(c).alias(f"__a_{c}") for c in mh_cols],
        )
        sb = lookup.select(
            F.col(id_col).alias("id_b"),
            *[F.col(c).alias(f"__b_{c}") for c in mh_cols],
        )
        matches = F.lit(0)
        for c in mh_cols:
            matches = matches + F.when(
                F.col(f"__a_{c}") == F.col(f"__b_{c}"), 1
            ).otherwise(0)
        pairs = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                (matches / F.lit(self.num_hashes)).alias("est_jaccard"),
            )
            .filter(F.col("est_jaccard") >= threshold)
        )
        return fresh_sig, pairs

    # -------------------------------------------------------- commit
    # per-partition-dir file count that triggers auto-compaction at
    # the end of a commit: every commit adds ~1 file per touched dir,
    # so an unmaintained long stream accumulates one file per batch
    # per dir and the probe's pruned reads degrade into a
    # small-files listing problem. 64 bounds a dir's files while
    # keeping compaction amortized (one fold per 64 batches).
    COMPACT_THRESHOLD = 64

    def commit(self, fresh_sig: DataFrame, batch_id: int = 0) -> None:
        """Append a batch's fresh signatures: band rows FIRST, then
        signature rows (see module docstring for the crash order).
        Each partition dir only ever GAINS files — O(batch) writes —
        and when the sigs store's first partition dir crosses
        COMPACT_THRESHOLD files the whole store folds to one file per
        dir (stage + swap, crash leaves old or new set, both
        complete). The trigger samples ONE dir instead of walking the
        tree: commits touch every populated dir symmetrically, so any
        dir's file count tracks the batch count."""
        from data_engineering_pipeline_spark.operators.dedup import (
            _band_rows,
            _band_structs,
        )

        self._write_meta()
        rows = _band_rows(self.num_hashes, self.bands)
        band_cols = _band_structs(self.bands, rows)
        stage = os.path.join(self.root, ".stage-" + uuid.uuid4().hex)
        b_stage = os.path.join(stage, "banded")
        s_stage = os.path.join(stage, "sigs")
        banded = (
            fresh_sig.select(
                F.col(self.id_col),
                F.explode(F.array(*band_cols)).alias("bb"),
            )
            .select(
                self.id_col,
                F.col("bb.band").alias("band"),
                F.col("bb.bucket").alias("bucket"),
            )
            .withColumn(
                "bpfx", F.pmod(F.col("bucket"), F.lit(self.bucket_pfx))
            )
        )
        # one file per partition dir per commit: repartition by the
        # partition columns so a batch adds bands*bucket_pfx files,
        # not tasks x dirs
        banded.repartition("band", "bpfx").write.partitionBy(
            "band", "bpfx"
        ).mode("overwrite").parquet(b_stage)
        sigs = fresh_sig.withColumn(
            "pfx", self._pfx_expr(F.col(self.id_col))
        )
        sigs.repartition("pfx").write.partitionBy("pfx").mode(
            "overwrite"
        ).parquet(s_stage)
        tok = f"{batch_id}-{uuid.uuid4().hex}"
        if _move_partition_files(b_stage, self._banded, tok) == 0:
            # empty batch: nothing to land (a replayed batch's fresh
            # set is empty — no empty part-files accumulating)
            shutil.rmtree(stage, ignore_errors=True)
            return
        _move_partition_files(s_stage, self._sigs, tok)
        shutil.rmtree(stage, ignore_errors=True)
        # trigger on the FULLEST dir, not the lexicographically first:
        # skewed/tiny batches don't touch dirs symmetrically, so a
        # single sampled dir can lag the real maximum by a multiple
        # (the walk is bounded — post-compaction every dir holds one
        # file, so this counts at most dirs x threshold files).
        dirs = self._sig_dirs(None)
        if dirs and max(_n_parquet(d) for d in dirs) > self.COMPACT_THRESHOLD:
            self.compact()

    # --------------------------------------------------- maintenance
    def migrate_flat(self, flat_sigs: DataFrame, batch_id: int = 0) -> None:
        """One-shot migration from the flat single-directory store:
        commit the whole flat frame as one batch (anti-joined against
        anything already migrated, so a crashed migration replays to
        convergence)."""
        fresh = flat_sigs
        if self.exists():
            fresh = flat_sigs.join(
                self.seen_ids(flat_sigs.select(self.id_col)),
                self.id_col,
                "left_anti",
            )
        self.commit(fresh, batch_id)

    def compact(self) -> None:
        """Fold each partition dir's accumulated per-batch files into
        one file (stage + swap per store; crash leaves either the old
        or the new file set, both complete)."""
        for base in (self._banded, self._sigs):
            if not _dir_has_parquet(base):
                continue
            df = self.spark.read.parquet(base)
            pcols = (
                ["band", "bpfx"] if base is self._banded else ["pfx"]
            )
            stage = base + ".compact-" + uuid.uuid4().hex[:8]
            df.repartition(*pcols).write.partitionBy(*pcols).mode(
                "overwrite"
            ).parquet(stage)
            aside = base + ".old-" + uuid.uuid4().hex[:8]
            os.rename(base, aside)
            os.rename(stage, base)
            shutil.rmtree(aside, ignore_errors=True)


def open_migrated(
    spark: SparkSession, root: str, **kwargs
) -> BandedSignatureStore:
    """Open a store at `root`, migrating a pre-bucketing FLAT layout
    (part-files directly in the directory — streaming/sinks.py's old
    `_append_parquet` shape and the curation pipeline's old
    mode-append shape) in place. Crash-safe: the flat files are only
    removed AFTER the migration commit lands; a replayed migration
    anti-joins to a no-op."""
    st = BandedSignatureStore(spark, root, **kwargs)
    if not os.path.isdir(root):
        return st
    flat = sorted(
        f for f in os.listdir(root) if f.endswith(".parquet")
    )
    if flat:
        df = spark.read.parquet(*[os.path.join(root, f) for f in flat])
        mh = [c for c in df.columns if c.startswith("mh_")]
        st.migrate_flat(df.select(st.id_col, *mh))
        for f in flat:
            os.remove(os.path.join(root, f))
        success = os.path.join(root, "_SUCCESS")
        if os.path.exists(success):
            os.remove(success)
    return st


def _dir_has_parquet(path: str) -> bool:
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _n_parquet(path: str) -> int:
    n = 0
    for _root, _dirs, files in os.walk(path):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def _partition_dirs(base: str, wanted: dict) -> list[str]:
    """List `base`'s hive partition dirs, keeping only values in
    `wanted` ({col: list|None}); single-level layouts only."""
    ((col, values),) = wanted.items()
    out = []
    for d in sorted(glob.glob(os.path.join(base, f"{col}=*"))):
        v = int(os.path.basename(d).split("=", 1)[1])
        if values is None or v in values:
            out.append(d)
    return out


def _move_partition_files(stage: str, dest: str, tok: str) -> int:
    """Move every staged part-file into the matching partition dir
    under `dest` with unique names (the sinks' append discipline,
    partition-aware). Returns the number of files moved."""
    moved = 0
    for root, _dirs, files in os.walk(stage):
        rel = os.path.relpath(root, stage)
        for i, f in enumerate(sorted(files)):
            if not f.endswith(".parquet"):
                continue
            tgt_dir = dest if rel == "." else os.path.join(dest, rel)
            os.makedirs(tgt_dir, exist_ok=True)
            os.rename(
                os.path.join(root, f),
                os.path.join(tgt_dir, f"app-{tok}-{moved:05d}.parquet"),
            )
            moved += 1
    return moved
