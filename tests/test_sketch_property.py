"""Property tests for the sketch tier: each sketch carries an
invariant that must hold on EVERY input (not just in expectation), so
they are ideal hypothesis targets — the quantile bracket, HLL merge
algebra, and the Bloom no-false-negative guarantee. Example counts are
small (each example runs Spark jobs); the registry oracles pin the
same operators relationally."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    xs=st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300
    ),
    pct=st.integers(min_value=1, max_value=99),
)
def test_qsketch_bracket_holds_on_any_input(spark, xs, pct):
    """The chosen bucket's [lo, hi] must bracket the exact
    nearest-rank order statistic for ANY value multiset and ANY
    percentile — a structural consequence of monotone bucketing, so a
    single violation is a plumbing bug, never noise."""
    from data_engineering_pipeline_spark.operators.sketch import (
        qsketch_build,
        qsketch_quantiles,
    )

    df = spark.createDataFrame([("g", x) for x in xs], "g string, x long")
    r = qsketch_quantiles(
        qsketch_build(df, "g", F.col("x")), [pct]
    ).collect()[0]
    exact = sorted(xs)[(len(xs) - 1) * pct // 100]
    assert r.n == len(xs)
    assert r.lo <= exact <= r.hi, (xs, pct, r, exact)
    assert r.lo <= r.est <= r.hi


@settings(**_SETTINGS)
@given(
    a=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=80),
    b=st.lists(st.text(min_size=1, max_size=12), min_size=1, max_size=80),
)
@pytest.mark.slow  # heavy e2e/property: close-out tier (pytest.ini)
def test_hll_merge_commutes_and_is_idempotent(spark, a, b):
    """Register merge is max per (group, reg): merge(A, B) ==
    merge(B, A) == merge(A, A, B) == registers(A ++ B) exactly."""
    from data_engineering_pipeline_spark.operators.sketch import (
        hll_merge,
        hll_registers,
    )

    da = spark.createDataFrame([("g", v) for v in a], "g string, v string")
    db = spark.createDataFrame([("g", v) for v in b], "g string, v string")
    ra = hll_registers(da, "g", F.col("v"))
    rb = hll_registers(db, "g", F.col("v"))
    want = {
        tuple(r)
        for r in hll_registers(
            da.unionByName(db), "g", F.col("v")
        ).collect()
    }
    assert {tuple(r) for r in hll_merge(ra, rb).collect()} == want
    assert {tuple(r) for r in hll_merge(rb, ra).collect()} == want
    assert {tuple(r) for r in hll_merge(ra, ra, rb).collect()} == want


@settings(**_SETTINGS)
@given(
    members=st.lists(
        st.text(min_size=1, max_size=16), min_size=1, max_size=120
    )
)
def test_bloom_never_misses_a_member(spark, members):
    from data_engineering_pipeline_spark.operators.sketch import (
        bloom_build,
        bloom_member,
    )

    df = spark.createDataFrame([(v,) for v in set(members)], "v string")
    bloom = bloom_build(df, F.col("v"))
    out = bloom_member(df, bloom, F.col("v")).collect()
    assert all(r.is_member == 1 for r in out)


@settings(**_SETTINGS)
@given(
    a=st.lists(st.text(min_size=1, max_size=10), min_size=1, max_size=50),
    b=st.lists(st.text(min_size=1, max_size=10), min_size=1, max_size=50),
)
def test_kmv_difference_exact_when_union_underfull(spark, a, b):
    """Whenever |A ∪ B| < k the union sample IS the union, so the
    estimate must equal the exact difference — for ANY pair of sets."""
    from data_engineering_pipeline_spark.operators.sketch import (
        kmv_difference_pairs,
        kmv_points,
    )

    rows = [("A", v) for v in a] + [("B", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v string")
    pairs = spark.createDataFrame([("A", "B")], "ga string, gb string")
    r = kmv_difference_pairs(
        kmv_points(df, "g", F.col("v")), pairs, k=128
    ).collect()[0]
    exact = len(set(b) - set(a))
    assert r.n_new_exact == exact
    if r.n_sample < 128:
        assert r.n_new_est == float(exact)


@settings(**_SETTINGS)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    simvals=st.lists(
        st.integers(min_value=-500, max_value=500), min_size=64, max_size=64
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_mmr_matches_python_greedy_trace(spark, data, simvals, k):
    """The distributed MMR must reproduce the reference greedy exactly
    — argmax of score - max(sim to picked), ties to the smallest id —
    on ANY candidate set and similarity matrix."""
    from data_engineering_pipeline_spark.operators.search import (
        mmr_rerank,
    )

    ids = [i for i, _ in data]
    scores = dict(data)
    sim = {}
    it = iter(simvals * 2)
    for a in ids:
        for b in ids:
            if a != b:
                sim[(a, b)] = next(it)

    def model():
        remaining, picked, out = set(ids), [], []
        while remaining and len(picked) < k:
            best, best_obj = None, None
            for c in sorted(remaining):
                # symmetric-penalty contract (operators/search.py):
                # max of both directions, so one-directional inputs
                # are never under-penalized
                pen = max(
                    (
                        max(sim.get((c, s), 0), sim.get((s, c), 0))
                        for s in picked
                    ),
                    default=0,
                )
                obj = scores[c] - (pen if picked else 0)
                if best_obj is None or obj > best_obj:
                    best, best_obj = c, obj
            picked.append(best)
            remaining.discard(best)
            out.append((len(picked), best, best_obj))
        return out

    cands = spark.createDataFrame(
        [(i, s) for i, s in data], "doc_id long, score long"
    )
    sims = spark.createDataFrame(
        [(a, b, v) for (a, b), v in sim.items()] or [(0, 0, 0)],
        "ia long, ib long, sim long",
    )
    if not sim:
        sims = sims.filter("ia <> ib")
    got = [
        (r.rank, r.doc_id, r.mmr_obj)
        for r in mmr_rerank(cands, sims, k=k).orderBy("rank").collect()
    ]
    assert got == model()


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.integers(min_value=-(1 << 62), max_value=(1 << 62) - 1),
        min_size=1,
        max_size=120,
    ),
    data=st.data(),
)
@pytest.mark.slow  # heavy e2e/property: close-out tier (pytest.ini)
def test_exact_kth_values_property(spark, vals, data):
    """Property: for ANY int64 multiset and ANY set of valid ranks,
    exact_kth_values equals the driver-side sorted answer — the
    bit-parity contract the scale-safe tercile freeze rests on."""
    from data_engineering_pipeline_spark.operators.sketch import (
        exact_kth_values,
    )

    ks = data.draw(
        st.lists(
            st.integers(min_value=1, max_value=len(vals)),
            min_size=1,
            max_size=5,
            unique=True,
        )
    )
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    s = sorted(vals)
    assert exact_kth_values(df, "x", ks) == {k: s[k - 1] for k in ks}
