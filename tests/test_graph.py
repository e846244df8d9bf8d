"""connected_components semantics on a known graph: chain, triangle,
singleton, and convergence within diameter iterations."""

from __future__ import annotations

from data_engineering_pipeline_spark.operators.graph import connected_components


def test_components_on_known_graph(spark):
    vertices = spark.createDataFrame([(i,) for i in range(8)], "id long")
    # chain 0-1-2-3, triangle 4-5-6 (+ closing edge), singleton 7
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4)], "src long, dst long"
    )
    got = {
        r.id: r.component
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 4, 7: 7}


def test_components_converge_on_long_chain(spark):
    n = 12
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = {
        r.id: r.component
        for r in connected_components(vertices, edges, max_iter=n).collect()
    }
    assert set(got.values()) == {0}


def test_pagerank_quantized_hand_computed(spark):
    """3-node toy graph checked against hand-run integer recurrence,
    plus partitioning invariance (exact ints — no float drift)."""
    from data_engineering_pipeline_spark.operators.graph import (
        pagerank_quantized,
    )

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 1, 1), (1, 3, 1)],
        "src long, dst long, w long",
    )
    got = {r.node: r.p for r in
           pagerank_quantized(edges, weight_col="w", iters=3).collect()}

    # hand-run the same recurrence
    scale, n = 10**12, 3
    base = ((15 * scale) // 100) // n
    p = {1: scale // n, 2: scale // n, 3: scale // n}
    adj = {1: [(2, 1), (3, 1)], 2: [(3, 1)], 3: [(1, 1)]}
    wout = {u: sum(w for _, w in vs) for u, vs in adj.items()}
    for _ in range(3):
        s = {v: 0 for v in p}
        for u, vs in adj.items():
            for v, w in vs:
                s[v] += (p[u] * w) // wout[u]
        p = {v: base + (85 * s[v]) // 100 for v in p}
    assert got == p

    got13 = {r.node: r.p for r in pagerank_quantized(
        edges.repartition(13), weight_col="w", iters=3).collect()}
    assert got13 == got


def test_cc_raises_on_non_convergence(spark):
    """r9 review: exhausting max_iter with labels still moving must
    raise, not silently return a SPLIT component (which would put
    near-duplicates astride a train/eval split). A 12-vertex chain
    has diameter 11: converges at max_iter=20, raises at max_iter=3."""
    import pytest as _pytest

    from data_engineering_pipeline_spark.operators.graph import (
        connected_components,
    )

    n = 12
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    ok = connected_components(verts, edges, max_iter=20)
    assert {r.component for r in ok.collect()} == {0}
    with _pytest.raises(ValueError, match="did not converge"):
        connected_components(verts, edges, max_iter=3)
