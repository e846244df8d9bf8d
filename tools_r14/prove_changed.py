"""Entry-surface oracle proof for the r14-changed queries at BOTH
sf0.001 and sf0.01 (the /verify recipe, driven from a fresh process):
sorted rows + column names vs DuckDB, null-safe, 1e-12 float band.

Usage: python tools_r14/prove_changed.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHANGED = [
    "dedup-incremental-store",
    "dedup-minhash-lsh",
    "dedup-keep-best",
    "dedup-components",
    "curation-split-leakage",
    "search-mmr-rerank",
    "op-snapshot-cdf",
    "op-snapshot-cdf-mor",
    "op-snapshot-change-feed",
    "op-snapshot-change-feed-format",
    "op-snapshot-clone",
    "op-snapshot-cluster-merge",
    "op-snapshot-incr-agg",
    "op-snapshot-incr-agg-cdf",
    "op-snapshot-incr-join",
    "op-snapshot-merge",
    "op-snapshot-merge-mor",
    "op-snapshot-restore",
    "op-snapshot-star-agg",
    "op-snapshot-time-travel",
    "op-snapshot-wap",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    import duckdb

    import __spark_entry__ as m
    from data_engineering_pipeline_spark.session import get_spark

    names = sys.argv[1:] or CHANGED
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs, osql = m.queries(), m.oracle_sql()
    bad = 0
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in TABLES:
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            df = qs[name](spark, sf)
            scols = sorted(df.columns)
            srows = sorted(
                tuple(r[c] for c in scols) for r in df.collect()
            )
            odf = con.sql(osql[name]).df()
            ocols = sorted(odf.columns)
            orows = sorted(
                tuple(r)
                for r in odf[ocols].itertuples(index=False, name=None)
            )
            ok = (
                scols == ocols
                and len(srows) == len(orows)
                and all(
                    all(
                        (a == b)
                        or (a is None and b is None)
                        or (
                            isinstance(a, float)
                            and isinstance(b, float)
                            and abs(a - b) < 1e-12
                        )
                        for a, b in zip(ra, rb)
                    )
                    for ra, rb in zip(srows, orows)
                )
            )
            tag = os.path.basename(sf)
            print(f"{tag} {name} {'OK' if ok else 'MISMATCH'}", flush=True)
            bad += 0 if ok else 1
        con.close()
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
