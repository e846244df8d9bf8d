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


def test_rotate_fronts_changed_since_evidence(monkeypatch):
    """A query whose implementation changed in an optimization round
    AFTER its latest driver-green row (queries/__init__.py
    _CHANGED_IN_ROUND) must front the window — just behind the
    never-checked block — until a green row from a round >= the change
    round banks the equivalence claim at the driver (r13 verdict
    item 3)."""
    import data_engineering_pipeline_spark.queries as qmod

    monkeypatch.setattr(
        qmod, "_latest_green_rounds",
        lambda root=None: {"stale": 11, "banked": 13, "old": 10},
    )
    monkeypatch.setattr(
        qmod, "_CHANGED_IN_ROUND", {"stale": 13, "banked": 13},
    )
    d = {k: None for k in ("banked", "old", "stale", "virgin")}
    # virgin never checked -> leads; stale changed in r13 with r11
    # evidence -> fronts next; banked's r13 row covers its r13 change
    # -> normal order; old (r10) precedes banked (r13).
    assert list(qmod._rotate(d)) == ["virgin", "stale", "old", "banked"]


def test_real_registry_leads_with_oldest_evidence():
    """The actual registry order must start with the queries whose
    committed driver evidence is oldest — the r9 verdict expects the
    r10 window to lead with the 12 r6-evidence rows. Queries in the
    changed-since-evidence front list are exempt: they deliberately
    jump the oldest-evidence order until the driver banks their
    post-change proof."""
    from data_engineering_pipeline_spark.queries import _CHANGED_IN_ROUND

    latest = _latest_green_rounds()
    rotated = _rotate({q: None for q in latest})
    rounds = [
        latest[q] for q in rotated
        if latest[q] >= _CHANGED_IN_ROUND.get(q, 0)
    ]
    assert rounds == sorted(rounds)
    # and every fronted query sits before every non-fronted one
    fronted = [
        i for i, q in enumerate(rotated)
        if latest[q] < _CHANGED_IN_ROUND.get(q, 0)
    ]
    if fronted:
        first_normal = min(
            i for i, q in enumerate(rotated)
            if latest[q] >= _CHANGED_IN_ROUND.get(q, 0)
        )
        assert max(fronted) < first_normal
