"""Property-based check (Hypothesis) of merge_last_write_wins against a
dict-semantics model: for ANY batches, merging must keep exactly the
highest-(version, src) row per key — the ON CONFLICT DO UPDATE model
(database.py:124-130)."""

from __future__ import annotations

import pytest

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


def _snap_model(target, source, when_matched, insert):
    """Dict-semantics MERGE model: target/source are {k: v} maps."""
    out = {}
    skeys = set(source)
    for k, v in target.items():
        if k in skeys:
            if when_matched == "update":
                out[k] = source[k]
            # delete: dropped
        else:
            out[k] = v
    if insert:
        for k, v in source.items():
            if k not in target:
                out[k] = v
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tgt=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-50, max_value=50),
        min_size=1, max_size=12,
    ),
    src=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-50, max_value=50),
        max_size=12,
    ),
    when_matched=st.sampled_from(["update", "delete"]),
    insert=st.booleans(),
)
def test_snapshot_merge_matches_dict_model(
    spark, tmp_path_factory, tgt, src, when_matched, insert
):
    """MERGE INTO on the snapshot table against the dict-semantics
    model, for arbitrary target/source key overlaps and all four
    matched/not-matched mode combinations."""
    from data_engineering_pipeline_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    if when_matched == "delete" and not insert and not src:
        return  # merge would be a no-op by contract
    base = tmp_path_factory.mktemp("snapmerge")
    t = SnapshotTable(spark, str(base / "t"))
    t.append(
        spark.createDataFrame(
            [(k, v) for k, v in tgt.items()], "k long, v long"
        )
    )
    src_df = spark.createDataFrame(
        [(k, v) for k, v in src.items()], "k long, v long"
    ) if src else spark.createDataFrame([], "k long, v long")
    t.merge_into(
        src_df, ["k"], when_matched=when_matched,
        insert_not_matched=insert,
    )
    got = {r.k: r.v for r in t.read().collect()}
    assert got == _snap_model(tgt, src, when_matched, insert)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tgt=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-50, max_value=50),
        min_size=1, max_size=10,
    ),
    steps=st.lists(
        st.tuples(
            st.dictionaries(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=-50, max_value=50),
                max_size=8,
            ),
            st.sampled_from(["update", "delete"]),
            st.booleans(),
        ),
        min_size=1, max_size=3,
    ),
)
def test_cow_and_mor_merge_sequences_equivalent(
    spark, tmp_path_factory, tgt, steps
):
    """COW and MoR are two WRITE strategies for one read-side contract:
    for ANY random sequence of merges, a copy-on-write table and a
    deletion-vector table fed the same batches must read identically —
    and both must equal the dict-semantics model — after EVERY step,
    and after compact() materializes the MoR masks away."""
    from data_engineering_pipeline_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    base = tmp_path_factory.mktemp("cowmor")
    init = spark.createDataFrame(
        [(k, v) for k, v in tgt.items()], "k long, v long"
    )
    tables = {}
    for mode in ("cow", "mor"):
        t = SnapshotTable(spark, str(base / mode))
        t.append(init)
        tables[mode] = t

    model = dict(tgt)
    for src, when_matched, insert in steps:
        if when_matched == "delete" and not insert and not src:
            continue
        src_df = spark.createDataFrame(
            [(k, v) for k, v in src.items()], "k long, v long"
        ) if src else spark.createDataFrame([], "k long, v long")
        for mode, t in tables.items():
            t.merge_into(
                src_df, ["k"], when_matched=when_matched,
                insert_not_matched=insert, mode=mode,
            )
        model = _snap_model(model, src, when_matched, insert)
        got = {
            mode: {r.k: r.v for r in t.read().collect()}
            for mode, t in tables.items()
        }
        assert got["cow"] == model
        assert got["mor"] == model

    # Materializing the deletion vectors must not change the data.
    tables["mor"].compact()
    assert {r.k: r.v for r in tables["mor"].read().collect()} == model


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    a0=st.dictionaries(
        st.integers(min_value=0, max_value=20),  # ak
        st.tuples(st.integers(min_value=0, max_value=3),   # j
                  st.integers(min_value=-9, max_value=9)),  # aval
        min_size=1, max_size=10,
    ),
    b0=st.dictionaries(
        st.integers(min_value=0, max_value=3),  # j
        st.integers(min_value=-9, max_value=9),  # bval
        min_size=1, max_size=4,
    ),
    steps=st.lists(
        st.tuples(
            st.sampled_from(["a_merge", "a_delete", "b_merge", "b_delete"]),
            st.dictionaries(
                st.integers(min_value=0, max_value=20),
                st.tuples(st.integers(min_value=0, max_value=3),
                          st.integers(min_value=-9, max_value=9)),
                min_size=1, max_size=4,
            ),
            st.booleans(),  # refresh after this step?
        ),
        min_size=1, max_size=4,
    ),
)
@pytest.mark.slow  # heavy e2e/property: close-out tier (pytest.ini)
def test_refresh_join_matches_full_recompute(
    spark, tmp_path_factory, a0, b0, steps
):
    """For ANY random interleaving of fact/dim merges and deletes —
    with refreshes landing after arbitrary subsets of the churn — the
    maintained view must equal a full join recompute at every refresh
    point, including the final one."""
    from data_engineering_pipeline_spark.sources.snapshot_table import (
        SnapshotTable, refresh_join,
    )

    base = tmp_path_factory.mktemp("rj")
    a = SnapshotTable(spark, str(base / "a"))
    b = SnapshotTable(spark, str(base / "b"))
    view = SnapshotTable(spark, str(base / "v"))
    a.append(spark.createDataFrame(
        [(k, j, v) for k, (j, v) in a0.items()], "ak long, j long, aval long"
    ))
    b.append(spark.createDataFrame(
        [(j, v) for j, v in b0.items()], "j long, bval long"
    ))

    def check():
        refresh_join(a, b, view, ["ak"], ["j"], ["j"])
        got = sorted(
            tuple(r) for r in
            view.read().select("j", "ak", "aval", "bval").collect()
        )
        want = sorted(
            tuple(r) for r in
            a.read().join(b.read(), ["j"])
            .select("j", "ak", "aval", "bval").collect()
        )
        assert got == want

    check()
    for op, payload, do_refresh in steps:
        if op == "a_merge":
            a.merge_into(spark.createDataFrame(
                [(k, j, v) for k, (j, v) in payload.items()],
                "ak long, j long, aval long",
            ), ["ak"])
        elif op == "a_delete":
            ks = ",".join(str(k) for k in payload)
            a.delete_where(f"ak IN ({ks})")
        elif op == "b_merge":
            b.merge_into(spark.createDataFrame(
                [(j % 4, v) for j, (_, v) in payload.items()][:4],
                "j long, bval long",
            ), ["j"], dedupe_source="bval")
        else:
            js = ",".join(str(j % 4) for j in payload)
            b.delete_where(f"j IN ({js})")
        if do_refresh:
            check()
    check()


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tgt=st.dictionaries(
        st.integers(min_value=0, max_value=20),
        st.integers(min_value=0, max_value=50),  # constraint-valid
        min_size=1, max_size=8,
    ),
    batches=st.lists(
        st.dictionaries(
            st.integers(min_value=0, max_value=20),
            st.integers(min_value=-50, max_value=50),
            max_size=6,
        ),
        min_size=1, max_size=3,
    ),
)
def test_constraints_atomic_under_merge_sequences(
    spark, tmp_path_factory, tgt, batches
):
    """For ANY sequence of merge batches against a CHECK-constrained
    table: a batch with a violating row is rejected ATOMICALLY (the
    table reads exactly as before, no partial postimages/inserts), and
    valid batches merge per the dict model."""
    from data_engineering_pipeline_spark.sources.snapshot_table import (
        ExpectationViolation,
        SnapshotTable,
    )

    import pytest as _pytest

    base = tmp_path_factory.mktemp("ckmerge")
    t = SnapshotTable(spark, str(base / "t"))
    t.append(spark.createDataFrame(
        [(k, v) for k, v in tgt.items()], "k long, v long"
    ))
    t.add_constraint("v_nonneg", "v >= 0")
    model = dict(tgt)
    for src in batches:
        if not src:
            continue
        src_df = spark.createDataFrame(
            [(k, v) for k, v in src.items()], "k long, v long"
        )
        if any(v < 0 for v in src.values()):
            with _pytest.raises(ExpectationViolation):
                t.merge_into(src_df, ["k"])
        else:
            t.merge_into(src_df, ["k"])
            model.update(src)
        assert {r.k: r.v for r in t.read().collect()} == model


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tgt=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-50, max_value=50),
        min_size=1, max_size=10,
    ),
    steps=st.lists(
        st.tuples(
            st.dictionaries(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=-50, max_value=50),
                max_size=8,
            ),
            st.sampled_from(["update", "delete"]),
            st.booleans(),
            st.sampled_from(["direct-cow", "direct-mor", "wap"]),
        ),
        min_size=1, max_size=3,
    ),
)
def test_publish_cycles_match_direct_dml_model(
    spark, tmp_path_factory, tgt, steps
):
    """Write-audit-publish is a TRANSPORT for DML, not a semantics
    change: for ANY random merge sequence, applying each step either
    directly on the source (COW or MoR) or through a fresh
    clone -> merge-on-the-branch -> publish_from cycle must leave the
    table equal to the dict-semantics model after every step. Pins
    the adoption path (renamed files, DV refs, removes) against the
    full merge behavior space, not one hand-picked scenario."""
    from data_engineering_pipeline_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    base = tmp_path_factory.mktemp("wapprop")
    t = SnapshotTable(spark, str(base / "t"))
    t.append(spark.createDataFrame(
        [(k, v) for k, v in tgt.items()], "k long, v long"
    ))
    model = dict(tgt)
    for i, (src, when_matched, insert, how) in enumerate(steps):
        if when_matched == "delete" and not insert and not src:
            continue
        src_df = spark.createDataFrame(
            [(k, v) for k, v in src.items()], "k long, v long"
        ) if src else spark.createDataFrame([], "k long, v long")
        if how == "wap":
            branch = t.clone_to(str(base / f"branch{i}"))
            branch.merge_into(
                src_df, ["k"], when_matched=when_matched,
                insert_not_matched=insert, mode="mor",
            )
            t.publish_from(branch)
        else:
            t.merge_into(
                src_df, ["k"], when_matched=when_matched,
                insert_not_matched=insert,
                mode=how.removeprefix("direct-"),
            )
        model = _snap_model(model, src, when_matched, insert)
        assert {r.k: r.v for r in t.read().collect()} == model


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    tgt=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-50, max_value=50),
        min_size=1, max_size=10,
    ),
    steps=st.lists(
        st.tuples(
            st.dictionaries(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=-50, max_value=50),
                max_size=8,
            ),
            st.sampled_from(["update", "delete"]),
            st.booleans(),
            st.sampled_from(["cow", "mor"]),
        ),
        min_size=1, max_size=3,
    ),
)
@pytest.mark.slow  # heavy e2e/property: close-out tier (pytest.ini)
def test_capture_net_diff_matches_file_diff(
    spark, tmp_path_factory, tgt, steps
):
    """changes() on a CDF table derives the net diff from captured
    change rows alone; for ANY random merge sequence it must equal
    the file-diff path row-for-row over EVERY (v_from, head) range —
    including multi-commit churn, where the netting logic (first
    preimage vs last postimage per key, no-op drops, insert-then-
    delete cancellation) actually has work to do."""
    from data_engineering_pipeline_spark.sources.snapshot_table import (
        SnapshotTable,
    )

    base = tmp_path_factory.mktemp("cdfnet")
    t = SnapshotTable(spark, str(base / "t"), cdf=True)
    t.append(spark.createDataFrame(
        [(k, v) for k, v in tgt.items()], "k long, v long"
    ))
    for src, when_matched, insert, mode in steps:
        if when_matched == "delete" and not insert and not src:
            continue
        src_df = spark.createDataFrame(
            [(k, v) for k, v in src.items()], "k long, v long"
        ) if src else spark.createDataFrame([], "k long, v long")
        t.merge_into(
            src_df, ["k"], when_matched=when_matched,
            insert_not_matched=insert, mode=mode,
        )
    head = t.latest_version()
    if head == 0:
        return  # every step was a no-op merge: nothing to compare
    # the fast path must actually engage (no silent diff fallback)
    assert t._changes_from_capture(0, head, ["k"]) is not None
    for v_from in range(0, head):
        fast = sorted(
            (r.k, r.v, r._change_type)
            for r in t.changes(v_from, head, ["k"]).collect()
        )
        slow = sorted(
            (r.k, r.v, r._change_type)
            for r in t.changes(
                v_from, head, ["k"], use_capture=False
            ).collect()
        )
        assert fast == slow, (v_from, head)
