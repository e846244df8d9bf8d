"""Property tests for the temporal join operators: as_of_join against
a pandas merge_asof reference under randomized keys/timestamps/gaps,
and range_join_bucketed against the brute-force pair set (including
negative epochs, where truncating integer div makes bucket 0 double
width — the adjacency probe must still cover every in-range pair)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_engineering_pipeline_spark.operators.temporal import (
    as_of_join,
    range_join_bucketed,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    left=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # key
            st.integers(min_value=-50, max_value=50),  # ts
        ),
        min_size=1,
        max_size=40,
    ),
    right=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=999),  # value
        ),
        min_size=0,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),  # dedup (key, ts): tie contract
    ),
    data=st.data(),
)
def test_as_of_join_matches_pandas_merge_asof(spark, left, right, data):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k long, ts long, lrow long",
    )
    rdf = spark.createDataFrame(right, "k long, ts long, v long") if right \
        else spark.createDataFrame([], "k long, ts long, v long")
    got = {
        (r.lrow): r.v
        for r in as_of_join(ldf, rdf, ["k"], "ts", ["v"]).collect()
    }
    lp = (
        pd.DataFrame(
            [(k, t, i) for i, (k, t) in enumerate(left)],
            columns=["k", "ts", "lrow"],
        )
        .astype("int64")
        .sort_values("ts", kind="mergesort")
    )
    rp = (
        pd.DataFrame(right, columns=["k", "ts", "v"])
        .astype("int64")
        .sort_values("ts", kind="mergesort")
    )
    want_df = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward",
        allow_exact_matches=True,
    )
    want = {
        int(r.lrow): (None if pd.isna(r.v) else int(r.v))
        for r in want_df.itertuples()
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    left=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=-200, max_value=200),
        ),
        min_size=1,
        max_size=25,
    ),
    right=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=-200, max_value=200),
        ),
        min_size=1,
        max_size=25,
    ),
    delta=st.integers(min_value=1, max_value=40),
)
def test_range_join_matches_brute_force(spark, left, right, delta):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k long, lts long, lrow long",
    )
    rdf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(right)],
        "k long, rts long, rrow long",
    )
    got = {
        (r.lrow, r.rrow)
        for r in range_join_bucketed(
            ldf, rdf, ["k"], "lts", "rts", delta
        ).collect()
    }
    want = {
        (i, j)
        for i, (lk, lt) in enumerate(left)
        for j, (rk, rt) in enumerate(right)
        if lk == rk and abs(lt - rt) <= delta
    }
    assert got == want
