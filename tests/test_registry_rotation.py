"""Driver-window rotation (queries/__init__.py): the logic that
decides WHICH ~50 queries the driver grades each round was itself
ungraded (r9 verdict item 7). Pin it against synthetic
CORRECTNESS_r*.json files: never-checked queries lead, then
oldest-evidence-first; err rows, rows_match=false, schema_match=false
and hash_match=false all don't count as green (r11 verdict nit 1: a
rows-match-but-hash-mismatch query must stay at the FRONT of the
driver window, not rotate out as freshly evidenced); corrupt/partial
files are skipped; ties break alphabetically; and the real registry
currently leads with the oldest-evidence rows."""

from __future__ import annotations

import json

from data_engineering_pipeline_spark.queries import (
    _latest_green_rounds,
    _rotate,
)


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(
        payload if isinstance(payload, str) else json.dumps(payload)
    )


def _green(**over):
    row = {"rows_match": True, "schema_match": True, "hash_match": True,
           "err": None}
    row.update(over)
    return row


def test_latest_green_rounds_parsing_rules(tmp_path):
    _write(tmp_path, "CORRECTNESS_r01.json", {
        "a": _green(),
        "b": _green(),
        "c": _green(rows_match=False),        # red: not green
        "d": _green(err="boom"),              # err: not green
        "e": "not-a-dict",                    # malformed row: skipped
        "f": _green(hash_match=False),        # value mismatch: not green
        "g": _green(schema_match=False),      # schema mismatch: not green
    })
    _write(tmp_path, "CORRECTNESS_r02.json", {
        "a": _green(),                        # a re-proven in r2
        "c": _green(),                        # c first green in r2
    })
    _write(tmp_path, "CORRECTNESS_r03.json", "{ corrupt json !!")
    _write(tmp_path, "CORRECTNESS_r04.json", ["not", "a", "dict"])
    _write(tmp_path, "not_correctness.txt", "ignored")

    got = _latest_green_rounds(root=tmp_path)
    assert got == {"a": 2, "b": 1, "c": 2}


def test_latest_green_survives_round_ten_and_sorts_numerically(tmp_path):
    # two-digit rounds: r10 must parse as 10, not sort/regex-trip
    _write(tmp_path, "CORRECTNESS_r09.json", {"a": _green()})
    _write(tmp_path, "CORRECTNESS_r10.json", {"a": _green(),
                                              "b": _green()})
    got = _latest_green_rounds(root=tmp_path)
    assert got == {"a": 10, "b": 10}


def test_rotate_order_never_checked_then_oldest_then_alpha(monkeypatch):
    import data_engineering_pipeline_spark.queries as qmod

    monkeypatch.setattr(
        qmod, "_latest_green_rounds",
        lambda root=None: {"w": 3, "x": 1, "y": 1, "q": 2},
    )
    d = {k: k.upper() for k in ("q", "w", "x", "y", "zz_new", "aa_new")}
    rotated = qmod._rotate(d)
    # aa_new/zz_new never checked -> lead (alphabetical); then the
    # r1-evidence pair x,y (alphabetical), then r2, then r3
    assert list(rotated) == ["aa_new", "zz_new", "x", "y", "q", "w"]
    assert rotated["x"] == "X"  # values ride along


def test_real_registry_leads_with_oldest_evidence():
    """The actual registry order must start with the queries whose
    committed driver evidence is oldest — the r9 verdict expects the
    r10 window to lead with the 12 r6-evidence rows."""
    latest = _latest_green_rounds()
    rotated = _rotate({q: None for q in latest})
    rounds = [latest[q] for q in rotated]
    assert rounds == sorted(rounds)
