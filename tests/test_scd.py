"""SCD2 operator tests: the incremental merge must equal the full
rebuild on a time-split update log, and the change-detection must be
null-safe and tie-deterministic."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineering_pipeline_spark.operators.scd import (
    scd2_history,
    scd2_merge,
)
from data_engineering_pipeline_spark.sources import load_table


def _updates(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts"),
        F.col("o_orderkey").alias("tb"),
    )


def _rows(df):
    return sorted(
        (
            (r.custkey, r.priority, r.valid_from, r.valid_to)
            for r in df.collect()
        ),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_scd2_merge_equals_full_rebuild(spark, sf_smoke):
    u = _updates(spark, sf_smoke)
    pivot = u.approxQuantile("ts", [0.5], 0.0)[0]
    b1 = u.filter(F.col("ts") < pivot)
    b2 = u.filter(F.col("ts") >= pivot)
    cur = scd2_history(b1, ["custkey"], ["priority"], "ts", "tb")
    merged = scd2_merge(cur, b2, ["custkey"], ["priority"], "ts", "tb")
    full = scd2_history(u, ["custkey"], ["priority"], "ts", "tb")
    assert _rows(merged) == _rows(full)
    # exactly one open version per key present in the log
    open_rows = [r for r in _rows(full) if r[3] is None]
    assert len(open_rows) == u.select("custkey").distinct().count()


def test_scd2_change_detection_null_safe_and_tied(spark):
    rows = [
        # key 1: null -> 'a' -> 'a' (no-op) -> null (change back)
        (1, None, 10, 100),
        (1, "a", 20, 101),
        (1, "a", 30, 102),
        (1, None, 40, 103),
        # key 2: two updates at the SAME ts, sequenced by tiebreak
        (2, "x", 10, 200),
        (2, "y", 10, 201),
    ]
    df = spark.createDataFrame(
        rows, "custkey long, priority string, ts long, tb long"
    )
    hist = _rows(scd2_history(df, ["custkey"], ["priority"], "ts", "tb"))
    # None-aware sort order: non-null priorities first within a key
    assert hist == [
        (1, "a", 20, 40),   # the no-op update at ts=30 left no version
        (1, None, 10, 20),
        (1, None, 40, None),
        (2, "x", 10, 10),   # zero-length version: closed by the tied update
        (2, "y", 10, None),
    ]
    # merging an unchanged-attribute update is a no-op on the table
    cur = scd2_history(df, ["custkey"], ["priority"], "ts", "tb")
    noop = spark.createDataFrame(
        [(1, None, 50, 300)], "custkey long, priority string, ts long, tb long"
    )
    merged = _rows(scd2_merge(cur, noop, ["custkey"], ["priority"], "ts", "tb"))
    assert merged == hist


def test_scd2_merge_rejects_negative_tiebreak(spark):
    """r9 review: the replayed open row reserves tiebreak -1 so it
    sorts before any real update at the same ts — an update carrying a
    negative tiebreak could sort before the seed and silently reorder
    history; it must be rejected."""
    import pytest as _pytest

    from data_engineering_pipeline_spark.operators.scd import (
        scd2_history,
        scd2_merge,
    )

    ups = spark.createDataFrame(
        [(1, "a", 10, 0)], "k long, v string, ts long, seq long"
    )
    cur = scd2_history(ups, ["k"], ["v"], "ts", "seq")
    bad = spark.createDataFrame(
        [(1, "b", 10, -3)], "k long, v string, ts long, seq long"
    )
    with _pytest.raises(Exception, match="must be >= 0"):
        scd2_merge(cur, bad, ["k"], ["v"], "ts", "seq").collect()


def test_scd2_merge_invariant_property(spark):
    """Property: merge(history(b1), b2) == history(b1 + b2) for ANY
    per-key time-ordered batch split — randomized keys, values with
    nulls, ties on ts broken by seq, no-op updates interleaved."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from data_engineering_pipeline_spark.operators.scd import (
        scd2_history,
        scd2_merge,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=2),        # key
                st.one_of(st.none(), st.sampled_from("abc")),  # value
                st.integers(min_value=0, max_value=20),        # ts
            ),
            min_size=1,
            max_size=24,
        ),
        cut_frac=st.floats(min_value=0.0, max_value=1.0),
    )
    def run(rows, cut_frac):
        # seq = arrival order (the deterministic tiebreak); the batch
        # split must be time-ordered PER KEY: sort by (ts, seq) and cut
        seqd = [(k, v, t, i) for i, (k, v, t) in enumerate(rows)]
        seqd.sort(key=lambda r: (r[2], r[3]))
        cut = int(len(seqd) * cut_frac)
        schema = "k long, v string, ts long, seq long"
        b1 = spark.createDataFrame(seqd[:cut], schema) if cut else None
        b2 = spark.createDataFrame(
            seqd[cut:], schema
        ) if cut < len(seqd) else None
        full = {
            tuple(r)
            for r in scd2_history(
                spark.createDataFrame(seqd, schema),
                ["k"], ["v"], "ts", "seq",
            ).collect()
        }
        if b1 is None or b2 is None:
            return  # degenerate split: nothing to merge
        cur = scd2_history(b1, ["k"], ["v"], "ts", "seq")
        merged = {
            tuple(r)
            for r in scd2_merge(
                cur, b2, ["k"], ["v"], "ts", "seq"
            ).collect()
        }
        # scd2_merge replays open rows with tiebreak -1, so the
        # surviving rows' seq values differ; compare the HISTORY
        # CONTENT (key, value, valid_from, valid_to)
        assert merged == full

    run()


def test_scd2_merge_rejects_null_tiebreak_with_readable_message(spark):
    """r10 (ADVICE): a NULL tiebreak made `tb >= 0` NULL, which fell
    to the otherwise branch where concat with the NULL cast nulled the
    whole diagnostic — raise_error fired with an opaque null message.
    NULLs must hit the SAME readable error as negatives."""
    import pytest as _pytest

    from data_engineering_pipeline_spark.operators.scd import (
        scd2_history,
        scd2_merge,
    )

    ups = spark.createDataFrame(
        [(1, "a", 10, 0)], "k long, v string, ts long, seq long"
    )
    cur = scd2_history(ups, ["k"], ["v"], "ts", "seq")
    bad = spark.createDataFrame(
        [(1, "b", 10, None)], "k long, v string, ts long, seq long"
    )
    with _pytest.raises(Exception, match="must be >= 0.*NULL"):
        scd2_merge(cur, bad, ["k"], ["v"], "ts", "seq").collect()
