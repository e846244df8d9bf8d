"""Spark Python DataSource over the snapshot table — `spark.read
.format("snapshot_table")` and `spark.readStream.format(
"snapshot_table")` as first-class Catalyst citizens.

The table format itself (sources/snapshot_table.py) is engine-side:
its SnapshotTable handle plans reads by resolving the manifest log
driver-side and handing Spark a pruned parquet file list. This module
exposes the SAME log through Spark 4's Python DataSource API
(SPARK-44076), which buys three things the handle can't give:

- **Catalyst filter pushdown** (`pushFilters`, 4.1): a `WHERE k = 7`
  on the DataFrame reaches `partitions()` as a typed filter and prunes
  FILES against the manifest's min/max stats before Spark schedules a
  single task — the handle's `read(prune=...)` discipline, but driven
  by the optimizer instead of the caller. Filters are re-applied by
  Spark after the scan (we return them all from pushFilters), so the
  prune being an over-approximation is invisible to correctness.
- **A streaming source**: `readStream` tails the commit log, each
  micro-batch covering the versions committed since the last offset —
  the Delta streaming-source protocol (offset = log version, batch =
  that range's added files, `skipChangeCommits` for rewrite commits).
  Offsets live in Spark's own streaming checkpoint, so restart
  resumes exactly.
- **Executor-side scan**: each live file (with its deletion vectors)
  is one `InputPartition`; workers read it with pyarrow and apply the
  DV mask locally, so a 1000-file table scans 1000-wide with no
  driver data movement.

Metadata resolution reuses SnapshotTable's own log replay — those
paths (versions, live files, schema, timestamps) are pure-Python over
the JSON log and never touch the SparkSession, so the planner can run
them inside the data-source sandbox with `SnapshotTable(None, path)`.

Scale notes: partition = file keeps planning O(live files) — the same
cost the handle pays — and the per-file DV mask is bounded by churn
since the last compaction. The Simple(prefetch-on-driver) stream
reader variant is deliberately NOT used: `DataSourceStreamReader`'s
partitions() path keeps micro-batch data on executors.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .snapshot_table import SnapshotTable, _may_contain

FORMAT_NAME = "snapshot_table"


def _meta_handle(options) -> SnapshotTable:
    path = options.get("path")
    if not path:
        raise ValueError("option 'path' is required (snapshot table dir)")
    # metadata-only handle: log replay never touches the session, so
    # None is safe inside the data-source planning sandbox
    return SnapshotTable(None, path)


def _resolve_version(t: SnapshotTable, options) -> int:
    v, ts = options.get("version"), options.get("timestamp")
    if v is not None and ts is not None:
        raise ValueError("pass version OR timestamp, not both")
    if ts is not None:
        return t.version_at_timestamp(float(ts))
    head = t.latest_version()
    if head is None:
        raise ValueError("empty table (no committed version)")
    return int(v) if v is not None else head


@dataclass
class _FilePartition(InputPartition):
    """One live data file: its physical location, the deletion-vector
    files masking it (absolute), its manifest name (DV rows carry
    the target's NAME, not its path), and — on column-mapped tables —
    the PHYSICAL column name serving each schema field (None entry =
    the file predates the column / its id was dropped: read null)."""

    name: str
    loc: str
    dvs: tuple
    schema_json: str
    phys: tuple | None = None


def _phys_names(t: SnapshotTable, e: dict, version: int,
                schema: StructType) -> tuple | None:
    """Column-mapping resolution for one file entry: the physical
    (write-time) name behind each of `schema`'s fields at `version`.
    None when the table has no mapping — the identity fast path. When
    a mapping exists the explicit tuple is always used, which also
    closes the drop-then-readd hazard (alignment never falls back to
    looking a CURRENT name up in a file that predates its id)."""
    cm = t._colmap_at(version)
    if cm is None:
        return None
    phys_of = t._entry_phys(e)
    return tuple(
        phys_of.get(cm[f.name]) if f.name in cm else f.name
        for f in schema.fields
    )


def _read_partition(part: _FilePartition) -> Iterator:
    """Executor-side scan of one file: pyarrow read, DV mask by row
    position, then align to the table schema (schema evolution: files
    written before a column existed read it as null; column mapping:
    fields are served by their write-time physical names)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    tbl = pq.read_table(part.loc)
    if part.dvs:
        dead: set = set()
        for dv in part.dvs:
            d = pq.read_table(dv, columns=["target", "pos"])
            tgt = d.column("target").to_pylist()
            pos = d.column("pos").to_pylist()
            dead.update(p for t, p in zip(tgt, pos) if t == part.name)
        if dead:
            mask = np.ones(tbl.num_rows, dtype=bool)
            mask[list(dead)] = False
            tbl = tbl.filter(pa.array(mask))
    spark_schema = StructType.fromJson(json.loads(part.schema_json))
    target = to_arrow_schema(spark_schema)
    cols = []
    for i, field in enumerate(target):
        src = part.phys[i] if part.phys is not None else field.name
        if src is not None and src in tbl.column_names:
            cols.append(tbl.column(src).cast(field.type))
        else:
            cols.append(pa.nulls(tbl.num_rows, type=field.type))
    out = pa.table(cols, schema=target)
    yield from out.to_batches(max_chunksize=1 << 16)


def _entry_partition(t: SnapshotTable, name: str, e: dict,
                     schema_json: str,
                     phys: tuple | None = None) -> _FilePartition:
    return _FilePartition(
        name=name,
        loc=os.path.abspath(t._data_path(name, e)),
        dvs=tuple(
            os.path.abspath(t._dv_path(p)) for p in e.get("dvs", ())
        ),
        schema_json=schema_json,
        phys=phys,
    )


def _schema_at(t: SnapshotTable, version: int) -> StructType:
    s = t._schema_at(version)
    if s is not None:
        # parquet scans surface every column nullable (and evolution
        # fills nulls); mirror that so the format's schema matches the
        # handle's read() exactly
        from pyspark.sql.types import StructField

        return StructType([
            StructField(f.name, f.dataType, True, f.metadata)
            for f in s.fields
        ])
    if s is None:
        # legacy log with no recorded schema: infer from one footer
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        live = t._live_files(version)
        name, e = next(iter(sorted(live.items())))
        return from_arrow_schema(
            pq.ParquetFile(t._data_path(name, e)).schema_arrow
        )
    return s


class SnapshotReader(DataSourceReader):
    """Batch scan, pinned at planning time (snapshot isolation: the
    file list is resolved once; later commits don't shift the scan)."""

    def __init__(self, options):
        t = _meta_handle(options)
        self._version = _resolve_version(t, options)
        schema = _schema_at(t, self._version)
        self._schema_json = schema.json()
        live = t._live_files(self._version)
        cm = t._colmap_at(self._version)
        self._parts = [
            _entry_partition(
                t, n, e, self._schema_json,
                phys=_phys_names(t, e, self._version, schema),
            )
            for n, e in sorted(live.items())
        ]
        # stats by file name, for pushFilters-driven pruning — keyed by
        # the CURRENT column names (translated through the mapping:
        # files written before a rename keep stats under the old name)
        if cm is None:
            self._stats = {
                n: e.get("stats", {}) for n, e in live.items()
            }
        else:
            self._stats = {
                n: {
                    f: mm
                    for f in schema.fieldNames()
                    if (mm := e.get("stats", {}).get(
                        t._stats_name(e, f, cm)
                    )) is not None
                }
                for n, e in live.items()
            }
        self._preds: list[tuple] = []  # (op, col, values)

    def pushFilters(self, filters):
        """Harvest file-prunable predicates; return EVERY filter so
        Spark still applies them row-level (the manifest prune is an
        over-approximation by design)."""
        ops = {
            EqualTo: "in", In: "in",
            GreaterThan: "gt", GreaterThanOrEqual: "ge",
            LessThan: "lt", LessThanOrEqual: "le",
        }
        for f in filters:
            attr = getattr(f, "attribute", None)
            op = ops.get(type(f))
            if op is None or not attr or len(attr) != 1:
                continue
            vals = (
                list(f.value) if isinstance(f, In) else [f.value]
            )
            self._preds.append((op, attr[0], vals))
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        def survives(mm: list, op: str, v) -> bool:
            """Can a row in a file with [min,max]=mm satisfy `op v`?
            Exact per operator — strict bounds DO prune the boundary
            file (max=299 cannot satisfy k > 299)."""
            try:
                if op == "in":
                    return _may_contain(mm, v, v)
                if op == "gt":
                    return mm[1] > v
                if op == "ge":
                    return mm[1] >= v
                if op == "lt":
                    return mm[0] < v
                return mm[0] <= v  # le
            except TypeError:
                return True  # cross-type compare: never prune

        def keep(name: str) -> bool:
            stats = self._stats.get(name, {})
            for op, col, values in self._preds:
                mm = stats.get(col)
                if mm is None:
                    continue  # no stats: cannot prune
                if not any(survives(mm, op, v) for v in values):
                    return False
            return True

        return [p for p in self._parts if keep(p.name)]

    def read(self, partition: _FilePartition) -> Iterator:
        return _read_partition(partition)


class SnapshotStreamReader(DataSourceStreamReader):
    """Streaming source: offset = committed log version; micro-batch
    (start, end] = the files ADDED by those commits. Commits that
    remove or mask rows (merge/delete/update/compaction) are not
    expressible as an append stream — they raise, unless
    `skipChangeCommits=true` skips them wholesale (Delta's contract).

    `startingVersion` (default 0) streams the table's retained history
    first; `startingVersion=latest` streams only commits after the
    query starts."""

    def __init__(self, options):
        self._options = options
        self._t = _meta_handle(options)
        self._cdc = str(
            options.get("readchangefeed", "false")
        ).lower() in ("true", "1", "yes")
        self._skip_changes = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1", "yes")
        start = str(options.get("startingversion", "0"))
        if start == "latest":
            head = self._t.latest_version()
            self._start = head if head is not None else -1
        else:
            self._start = int(start) - 1  # offset = last CONSUMED
        self._schema_json: str | None = None

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        head = self._t.latest_version()
        return {"version": head if head is not None else -1}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        lo, hi = start["version"], end["version"]
        if self._schema_json is None:
            self._schema_json = _schema_at(self._t, hi).json()
        if self._cdc:
            # CDC mode: stream every captured transition instead of
            # the append-only row stream. The same pinned-schema rule
            # applies: a mid-stream rename/drop requires a restart
            # (the BATCH cdc reader re-resolves its schema per read
            # and translates across renames; a stream cannot).
            for v in range(lo + 1, hi + 1):
                if self._t._read_manifest(v)["op"] in (
                    "rename", "drop_column"
                ):
                    raise ValueError(
                        f"version {v} renamed or dropped a column; "
                        "the stream's schema is pinned — restart the "
                        "streaming query to pick up the new schema"
                    )
            return _cdc_partitions_for_range(
                self._t, lo, hi, self._schema_json,
                self._skip_changes,
            )
        schema = StructType.fromJson(json.loads(self._schema_json))
        parts: list[InputPartition] = []
        for v in range(lo + 1, hi + 1):
            m = self._t._read_manifest(v)
            if m["op"] in ("rename", "drop_column"):
                # the stream's schema is pinned at its first batch; a
                # mid-stream mapping change would silently null-fill
                # the renamed column in every later file (Delta stops
                # the stream on schema changes for the same reason)
                raise ValueError(
                    f"version {v} renamed or dropped a column; the "
                    "stream's schema is pinned — restart the streaming "
                    "query to pick up the new schema"
                )
            if m["removes"] or m.get("dv_adds"):
                if self._skip_changes:
                    continue
                raise ValueError(
                    f"version {v} ({m['op']}) rewrites or masks rows; "
                    "an append stream cannot represent it — set "
                    "skipChangeCommits=true to skip such commits"
                )
            for a in m["adds"]:
                # stamp the adding version so column mapping resolves
                # the file's write-time physical names
                e = {**a, "v": v}
                parts.append(_entry_partition(
                    self._t, a["path"], e, self._schema_json,
                    phys=_phys_names(self._t, e, hi, schema),
                ))
        return parts

    def read(self, partition) -> Iterator:
        if isinstance(partition, _CdcPartition):
            return _read_cdc_partition(partition)
        return _read_partition(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the streaming checkpoint


@dataclass
class _CdcPartition(InputPartition):
    """One change-feed slice: a captured cdc file ('cdc') or an
    append commit's added file synthesized as inserts ('insert').
    `phys` carries the write-time physical name per row-schema field
    on column-mapped tables (feed rows serve END-version names)."""

    kind: str
    loc: str
    version: int
    schema_json: str  # row columns only
    phys: tuple | None = None


def _cdc_schema(row_schema: StructType) -> StructType:
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        list(row_schema.fields)
        + [
            StructField("_change_type", StringType(), True),
            StructField("_commit_version", LongType(), True),
        ]
    )


def _cdc_partitions_for_range(
    t: SnapshotTable, lo: int, hi: int, schema_json: str,
    skip_uncaptured: bool,
) -> list[_CdcPartition]:
    """Per-version feed slices over (lo, hi]: captured cdc files are
    served verbatim, pure appends synthesize inserts from their own
    added files, compact/purge contribute nothing. A change commit
    WITHOUT capture (pre-CDF DML, overwrite, restore, publish) is not
    expressible sandbox-side — raise (or skip wholesale), mirroring
    the engine-side change_feed()'s diff fallback being unavailable
    here."""
    schema = StructType.fromJson(json.loads(schema_json))
    mapped = t._colmap_at(hi) is not None
    parts: list[_CdcPartition] = []
    for v in range(lo + 1, hi + 1):
        m = t._read_manifest(v)
        if m.get("cdc"):
            # captured rows carry the names current at commit v; the
            # feed serves the END version's names — translate per field
            cdc_phys = (
                tuple(
                    t._name_at(v, f.name, hi) for f in schema.fields
                ) if mapped else None
            )
            for e in m["cdc"]:
                parts.append(_CdcPartition(
                    kind="cdc",
                    loc=os.path.abspath(
                        os.path.join(t.path, "data", e["path"])
                    ),
                    version=v,
                    schema_json=schema_json,
                    phys=cdc_phys,
                ))
            continue
        no_change = not m["removes"] and not m.get("dv_adds")
        if no_change and not m["adds"]:
            continue  # metadata-only commit
        if no_change:
            for a in m["adds"]:
                e = {**a, "v": v}
                parts.append(_CdcPartition(
                    kind="insert",
                    loc=os.path.abspath(t._data_path(a["path"], e)),
                    version=v,
                    schema_json=schema_json,
                    phys=_phys_names(t, e, hi, schema),
                ))
            continue
        if m["op"] in ("compact", "purge"):
            continue  # physical rewrite, no logical change
        if m["op"] in ("rename", "drop_column"):
            continue  # metadata-only schema change, no row change
        if skip_uncaptured:
            continue
        raise ValueError(
            f"version {v} ({m['op']}) has no captured change rows; "
            "the format's change feed serves cdf=True tables "
            "(engine-side SnapshotTable.change_feed() can diff it) — "
            "or set skipChangeCommits=true to skip such commits"
        )
    return parts


def _read_cdc_partition(part: _CdcPartition):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    tbl = pq.read_table(part.loc)
    row_schema = StructType.fromJson(json.loads(part.schema_json))
    target = to_arrow_schema(_cdc_schema(row_schema))
    n_rows = len(row_schema.fields)
    cols = []
    for i, field in enumerate(target):
        if field.name == "_commit_version":
            cols.append(pa.array(
                [part.version] * tbl.num_rows, type=field.type
            ))
            continue
        if field.name == "_change_type" and part.kind == "insert":
            cols.append(pa.array(
                ["insert"] * tbl.num_rows, type=field.type
            ))
            continue
        src = (
            part.phys[i]
            if part.phys is not None and i < n_rows
            else field.name
        )
        if src is not None and src in tbl.column_names:
            cols.append(tbl.column(src).cast(field.type))
        else:
            cols.append(pa.nulls(tbl.num_rows, type=field.type))
    out = pa.table(cols, schema=target)
    yield from out.to_batches(max_chunksize=1 << 16)


class SnapshotCdcReader(DataSourceReader):
    """Batch change-feed read (Delta's table_changes as a format):
    `option("readChangeFeed","true")` with startingVersion /
    endingVersion (inclusive commit range, default 0..head — the
    whole retained history, initial inserts included)."""

    def __init__(self, options):
        t = _meta_handle(options)
        head = t.latest_version()
        if head is None:
            raise ValueError("empty table (no committed version)")
        start = int(options.get("startingversion", "0"))
        end = int(options.get("endingversion", str(head)))
        schema_json = _schema_at(t, end).json()
        skip = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1", "yes")
        self._parts = _cdc_partitions_for_range(
            t, start - 1, end, schema_json, skip
        )

    def partitions(self) -> Sequence[InputPartition]:
        return self._parts

    def read(self, partition: _CdcPartition):
        return _read_cdc_partition(partition)


@dataclass
class _WroteFile(WriterCommitMessage):
    """Executor -> driver commit message: one staged data file."""

    name: str | None  # basename under <table>/data/, None if empty


def _refuse_engine_features(t: SnapshotTable) -> None:
    """The format writer is a pure append/overwrite path: CHECK
    constraints and generated columns are Spark-SQL expressions the
    sandboxed writer cannot evaluate — refuse loudly rather than
    silently skip the gate the handle API enforces."""
    if t.latest_version() is None:
        return
    props = t.properties_at()
    gated = sorted(
        k for k in props
        if k.startswith("constraint.") or k.startswith("generated.")
    )
    if gated:
        raise ValueError(
            f"table declares {gated}; the snapshot_table format "
            "writer cannot enforce constraints or materialize "
            "generated columns — write through SnapshotTable.append()"
        )


class _ArrowStager:
    """Shared executor-side write: stream RecordBatches into ONE
    parquet file directly under <table>/data/ with a fresh uuid name.
    The file is unreferenced until the driver's commit() publishes a
    manifest — a crash strands it for vacuum()'s grace-windowed sweep,
    never a visible partial write (the _stage() contract)."""

    def __init__(self, path: str):
        self._path = path

    def write(self, iterator) -> _WroteFile:
        import pyarrow.parquet as pq

        data = os.path.join(self._path, "data")
        os.makedirs(data, exist_ok=True)
        name = f"{__import__('uuid').uuid4().hex[:12]}-w.parquet"
        writer = None
        try:
            for batch in iterator:
                if batch.num_rows == 0:
                    continue
                if writer is None:
                    writer = pq.ParquetWriter(
                        os.path.join(data, name), batch.schema
                    )
                writer.write_batch(batch)
        finally:
            if writer is not None:
                writer.close()
        return _WroteFile(name if writer is not None else None)


def _commit_files(path: str, names: list[str], schema: StructType,
                  overwrite: bool,
                  txn: tuple[str, int] | None = None) -> None:
    """Driver-side second phase: footer-derived stats for the staged
    files, then one manifest through the table's own optimistic commit
    loop (append never conflicts; overwrite rebases cleanly; `txn`
    makes a streaming epoch's commit idempotent under replay)."""
    from .snapshot_table import _file_stats

    t = SnapshotTable(None, path)
    adds = _file_stats(
        [os.path.join(path, "data", n) for n in names],
        t._effective_stat_cols(),
    )

    if overwrite:
        def removes(live: dict) -> list[str]:
            return sorted(live)
    else:
        def removes(live: dict) -> list[str]:
            return []

    t._commit_loop(
        "overwrite" if overwrite else "append",
        adds, removes, schema=schema,
        replace_schema=overwrite, txn=txn,
    )


def _drop_staged(path: str, messages) -> None:
    for m in messages:
        if m and m.name:
            try:
                os.remove(os.path.join(path, "data", m.name))
            except OSError:
                pass


class SnapshotWriter(DataSourceArrowWriter):
    """Batch write: `df.write.format("snapshot_table").option("path",
    p).mode("append"|"overwrite").save()`. Creates the table on first
    write. True two-phase commit: executors stage, the driver's single
    manifest commit publishes — concurrent writers resolve through the
    table's optimistic protocol, not last-write-wins file clobbering."""

    def __init__(self, options, schema: StructType, overwrite: bool):
        t = _meta_handle(options)
        _refuse_engine_features(t)
        self._path = os.path.abspath(options["path"])
        self._schema = schema
        self._overwrite = overwrite

    def write(self, iterator) -> _WroteFile:
        return _ArrowStager(self._path).write(iterator)

    def commit(self, messages) -> None:
        names = [m.name for m in messages if m and m.name]
        _commit_files(self._path, names, self._schema, self._overwrite)

    def abort(self, messages) -> None:
        _drop_staged(self._path, messages)


class SnapshotStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink with EXACTLY-ONCE appends: `writeStream.format(
    "snapshot_table").option("path", p).option("txnAppId", id)`. Each
    epoch commits under txn=(txnAppId, batchId) — the table's
    idempotent-append protocol — so a replayed micro-batch (crash
    after commit, before the streaming checkpoint advanced) finds its
    txn in the log and becomes a no-op, its restaged files left as
    vacuum garbage. txnAppId is REQUIRED: deriving one silently would
    alias two different queries writing the same table."""

    def __init__(self, options, schema: StructType):
        t = _meta_handle(options)
        _refuse_engine_features(t)
        self._path = os.path.abspath(options["path"])
        self._schema = schema
        app = options.get("txnappid")
        if not app:
            raise ValueError(
                "option 'txnAppId' is required for exactly-once "
                "streaming writes (it keys the idempotent-append txn)"
            )
        self._app = app

    def write(self, iterator) -> _WroteFile:
        return _ArrowStager(self._path).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        names = [m.name for m in messages if m and m.name]
        _commit_files(
            self._path, names, self._schema, overwrite=False,
            txn=(self._app, batchId),
        )

    def abort(self, messages, batchId: int) -> None:
        _drop_staged(self._path, messages)


class SnapshotDataSource(DataSource):
    """`spark.dataSource.register(SnapshotDataSource)` then

        spark.read.format("snapshot_table").option("path", p).load()
        spark.readStream.format("snapshot_table").option("path", p)...

    Options: path (required); version | timestamp (batch time
    travel); startingVersion, skipChangeCommits (streaming)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        t = _meta_handle(self.options)
        if str(
            self.options.get("readchangefeed", "false")
        ).lower() in ("true", "1", "yes"):
            # the feed serves the ENDING version's column names
            # (SnapshotCdcReader resolves its row schema at `end`), so
            # the declared schema must resolve the same version — a
            # head-resolved schema would misalign (and fail the Arrow
            # read) whenever a rename landed after endingVersion
            # (r9 review, regression-pinned)
            head = t.latest_version()
            if head is None:
                raise ValueError("empty table (no committed version)")
            end = int(self.options.get("endingversion", str(head)))
            return _cdc_schema(_schema_at(t, end))
        return _schema_at(t, _resolve_version(t, self.options))

    def reader(self, schema: StructType) -> DataSourceReader:
        if str(
            self.options.get("readchangefeed", "false")
        ).lower() in ("true", "1", "yes"):
            return SnapshotCdcReader(self.options)
        return SnapshotReader(self.options)

    def streamReader(self, schema: StructType) -> SnapshotStreamReader:
        return SnapshotStreamReader(self.options)

    def writer(self, schema: StructType,
               overwrite: bool) -> SnapshotWriter:
        return SnapshotWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> SnapshotStreamWriter:
        return SnapshotStreamWriter(self.options, schema)


def register(spark) -> None:
    """Idempotent format registration for the session. Also enables
    Python data-source filter pushdown (off by default in 4.1) —
    without it Spark refuses any reader implementing pushFilters."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SnapshotDataSource)
