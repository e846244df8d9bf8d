"""Z-order (Morton) layout for multi-dimensional data skipping.

A parquet file's footer carries min/max stats per column; a reader
skips a file (or row group) whose range can't satisfy the predicate.
Sorting by ONE column makes only that column's ranges tight — a
predicate on a second dimension still touches every file. Interleaving
the bits of several grid coordinates (the Z-order curve) makes every
file's range tight in ALL interleaved dimensions at once, so
multi-dimensional box predicates prune most files. This is the same
layout trick Delta's OPTIMIZE ZORDER BY applies; here it is expressed
with plain Spark: compute the key, range-partition on it, sort within
partitions, write with bounded file sizes.

Everything is a pure Catalyst expression (shift/and/or folds) — no
UDFs, and the write path is the standard repartitionByRange (one
shuffle, the same shuffle any global sort would pay).

At 100 TB: grid coordinates come from KNOWN bounds (`grid_coord`) so
the mapping is a stateless per-row expression — no global rank, no
driver-side quantiles in the hot path. 8-12 bits per dimension (256-4096
cells) is plenty: finer grids than the file count add nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grid_coord(col: Column | str, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column with known bounds onto the integer grid
    [0, 2^bits): floor((x - lo) / (hi - lo) * 2^bits), clamped. Known
    (or approximate) bounds keep this a stateless per-row expression;
    mild bound error only skews cell occupancy, never correctness."""
    c = F.col(col) if isinstance(col, str) else col
    cells = 1 << bits
    scaled = F.floor(
        (c.cast("double") - F.lit(float(lo)))
        / F.lit(float(hi - lo))
        * F.lit(float(cells))
    ).cast("long")
    return F.greatest(F.least(scaled, F.lit(cells - 1)), F.lit(0))


def zorder_key(coords: list[Column], bits: int = 8) -> Column:
    """Morton key interleaving `bits` low bits of each coordinate
    column (values must already be in [0, 2^bits)). Bit i of coordinate
    j lands at position i * len(coords) + j — an unrolled sum of
    shift/and terms that whole-stage-codegens into straight-line JVM
    arithmetic."""
    ndim = len(coords)
    key = F.lit(0).cast("long")
    for j, c in enumerate(coords):
        cl = c.cast("long")
        for i in range(bits):
            bit = F.shiftright(cl, i).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, i * ndim + j)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    coords: list[Column],
    bits: int = 8,
    n_files: int = 16,
    max_records_per_file: int = 5_000_000,
) -> None:
    """Write `df` laid out along the Z-order curve of `coords`:
    range-partition on the Morton key (one shuffle — the same cost as
    any global sort), sort within partitions so parquet row groups get
    tight min/max on every interleaved dimension, bound file sizes.
    Readers need no special support: pushed-down box predicates skip
    non-overlapping files/row-groups from footer stats alone."""
    keyed = df.withColumn("__zkey", zorder_key(coords, bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .parquet(path)
    )
