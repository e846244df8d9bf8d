"""Property-based check (Hypothesis) of merge_last_write_wins against a
dict-semantics model: for ANY batches, merging must keep exactly the
highest-(version, src) row per key — the ON CONFLICT DO UPDATE model
(database.py:124-130)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_pipeline_spark.operators.upsert import merge_last_write_wins

KEYS = ["k1", "k2", "k3", "k4"]

row = st.tuples(
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=3),  # version
    st.integers(min_value=-100, max_value=100),  # value
)


def _model(old_rows, new_rows):
    best = {}
    for src, rows in ((0, old_rows), (1, new_rows)):
        for k, ver, val in rows:
            cur = best.get(k)
            # order: version desc, then new over old; later rows in the
            # same (version, src) class may be either — model keeps the
            # set of candidates and the test accepts any of them
            if cur is None or (ver, src) > (cur[0], cur[1]):
                best[k] = (ver, src, {val})
            elif (ver, src) == (cur[0], cur[1]):
                cur[2].add(val)
    return {k: (ver, src, vals) for k, (ver, src, vals) in best.items()}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    old_rows=st.lists(row, max_size=12),
    new_rows=st.lists(row, max_size=12),
)
def test_merge_matches_dict_model(spark, old_rows, new_rows):
    schema = "key string, version int, value int"
    old = spark.createDataFrame(old_rows, schema) if old_rows else None
    new = spark.createDataFrame(new_rows or [("k1", 0, 0)], schema)
    if not new_rows:
        new_rows = [("k1", 0, 0)]
    merged = merge_last_write_wins(old, new, ["key"], "version").collect()
    model = _model(old_rows, new_rows)
    assert len(merged) == len(model)
    for r in merged:
        ver, src, vals = model[r.key]
        assert r.version == ver
        assert r.value in vals
