"""Local mirror of the driver's correctness gate: run a Spark query and
its DuckDB oracle on the same parquet tables, compare row count, column
names, and order-insensitive values (floats with tolerance)."""

from __future__ import annotations

import math
import os

import duckdb

from data_engineering_pipeline_spark.schemas import TESTDATA_TABLES

# The driver hash-compares values EXACTLY — a tolerance here hides real
# gate failures (rel 1e-9 on a 3.7e5 mean admits a 1e-4 gap, i.e. a full
# flipped 4-dp round). Queries must be bit-identical cross-engine; see
# queries/_exact.py for how rounded means achieve that.
FLOAT_RTOL = 0.0
FLOAT_ATOL = 0.0


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    proj = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(proj, key=lambda r: tuple(str(x) for x in r))


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        if a == "NaN" or b == "NaN":
            return a == b
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return a == b
        return math.isclose(fa, fb, rel_tol=FLOAT_RTOL, abs_tol=FLOAT_ATOL)
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Returns a list of mismatch descriptions; empty == pass."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    d_rows = rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duckdb={len(d_rows)}")
        return problems

    _, s_sorted = _sorted_rows(s_cols, s_rows)
    _, d_sorted = _sorted_rows(d_cols, d_rows)
    n_bad = 0
    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for j, (a, b) in enumerate(zip(sr, dr)):
            if not _cells_equal(a, b):
                if n_bad < 5:
                    problems.append(f"row {i} col {sorted(s_cols)[j]}: spark={a!r} duckdb={b!r}")
                n_bad += 1
    if n_bad:
        problems.append(f"{n_bad} mismatched cells total")
    return problems
