"""Query registry: every module contributes QUERIES (name -> callable
(spark, sf_dir) -> DataFrame) and ORACLES (name -> DuckDB SQL string).
`__spark_entry__.py` aggregates these for the driver's correctness gate."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver's correctness gate checks ~50 queries per round in registry
# order, so the registry must lead with the queries whose driver evidence
# is oldest. Rather than a hand-maintained list (round-8 verdict item 2),
# the order is COMPUTED from the CORRECTNESS_r*.json files the driver
# commits to the repo root after each round: a query's "freshness" is the
# latest round with a green row (rows_match true, no err); never-checked
# queries (no green row in any file) lead the window outright, then
# everything else oldest-evidence-first. Ties break alphabetically so the
# order is deterministic across machines. Everything stays registered and
# locally oracle-tested (tests/test_oracle_queries.py) regardless of
# rotation.


def _latest_green_rounds(root=None) -> dict[str, int]:
    """Scan repo-root CORRECTNESS_r*.json -> {query: latest green round}.
    `root` overrides the scan directory (unit tests pin the parsing
    rules against synthetic files; production always uses the repo
    root)."""
    import json
    import re as _re
    from pathlib import Path

    repo_root = Path(root) if root else Path(__file__).resolve().parents[2]
    latest: dict[str, int] = {}
    for f in sorted(repo_root.glob("CORRECTNESS_r*.json")):
        m = _re.search(r"r(\d+)", f.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(f.read_text())
        except (OSError, ValueError):
            continue  # a corrupt/partial file must not break the registry
        if not isinstance(data, dict):
            continue
        for q, row in data.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


# Queries whose IMPLEMENTATION changed in an optimization round at or
# after their latest driver-green row carry unbanked semantic risk: the
# builder's change-time DuckDB re-proofs cover them, but the driver is
# ground truth for the equivalence claim (r13 verdict item 3 — 7 of the
# 9 r13-touched queries were last driver-checked BEFORE the change).
# Map query -> round whose optimization touched it. A listed query
# whose latest green evidence predates that round sorts just after the
# never-checked block, so it fronts the next ~50-query driver window;
# once a green row from a round >= the change round lands, the entry is
# inert (the query falls back into normal oldest-evidence order) and
# can be dropped at the next edit.
_CHANGED_IN_ROUND = {
    # r13 optimization touches (OPTIMIZATION_r13.md)
    "dedup-embedding-incremental-store": 13,
    "curation-decon-spans": 14,  # r14: ADVICE coalesce cleanup in the rebuild
    "text-contamination-bloom": 13,
    "text-bigram-ppl": 13,
    "text-kneser-ney-ppl": 13,
    "text-kneser-ney3-ppl": 13,
    "curation-ppl-gate": 13,
    "op-graph-pagerank": 13,
    # r14 optimization touches (OPTIMIZATION_r14.md): the minhash
    # array-form + store-probe sharing + CC star-forest convergence
    # family, and every query whose scenario calls merge_into (the
    # metadata job folds)
    "dedup-incremental-store": 14,
    "dedup-minhash-lsh": 14,
    "dedup-keep-best": 14,
    "dedup-components": 14,
    "curation-split-leakage": 14,
    "search-mmr-rerank": 14,
    "op-snapshot-cdf": 14,
    "op-snapshot-cdf-mor": 14,
    "op-snapshot-change-feed": 14,
    "op-snapshot-change-feed-format": 14,
    "op-snapshot-clone": 14,
    "op-snapshot-cluster-merge": 14,
    "op-snapshot-incr-agg": 14,
    "op-snapshot-incr-agg-cdf": 14,
    "op-snapshot-incr-join": 14,
    "op-snapshot-merge": 14,
    "op-snapshot-merge-mor": 14,
    "op-snapshot-restore": 14,
    "op-snapshot-star-agg": 14,
    "op-snapshot-time-travel": 14,
    "op-snapshot-wap": 14,
}


def _rotate(d: dict) -> dict:
    latest = _latest_green_rounds()

    # never-checked -> round 0 -> sorts first; then changed-since-
    # evidence (0.5); then oldest evidence first.
    def _key(q: str):
        lg = latest.get(q, 0)
        if lg and lg < _CHANGED_IN_ROUND.get(q, 0):
            return (0.5, q)
        return (lg, q)

    order = sorted(d, key=_key)
    return {k: d[k] for k in order}


def collect_registry() -> tuple[dict[str, QueryFn], dict[str, str]]:
    from data_engineering_pipeline_spark.queries import (
        operators as ops_mod,
        parity,
        tpch,
    )

    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for mod in (parity, ops_mod, tpch):
        queries.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    for mod_name in (
        "dedup",
        "text",
        "curation",
        "similarity",
        "streaming_batch",
        "multimodal",
        "extra",
        "temporal",
        "search",
    ):
        try:
            mod = __import__(
                f"data_engineering_pipeline_spark.queries.{mod_name}",
                fromlist=["QUERIES", "ORACLES"],
            )
            queries.update(mod.QUERIES)
            oracles.update(mod.ORACLES)
        except Exception as exc:  # noqa: BLE001 — one broken module must
            # not take down the whole registry (the driver grades what
            # loads); tests still surface the failure loudly.
            import warnings

            warnings.warn(f"query module {mod_name} failed to load: {exc}")
            continue
    return _rotate(queries), _rotate(oracles)
