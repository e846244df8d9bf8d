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
    """r9 review (contract kept through the r10 star rewrite):
    exhausting max_iter with the edge set still moving must raise, not
    silently return a SPLIT component (which would put near-duplicates
    astride a train/eval split). A 64-vertex chain cannot reach the
    star fixed point in one alternation round."""
    import pytest as _pytest

    from data_engineering_pipeline_spark.operators.graph import (
        connected_components,
    )

    n = 64
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    ok = connected_components(verts, edges)
    assert {r.component for r in ok.collect()} == {0}
    with _pytest.raises(ValueError, match="did not converge"):
        connected_components(verts, edges, max_iter=1)


def test_cc_star_chain_round_bound(spark):
    """r10: the whole point of the large-star/small-star rewrite is
    that rounds scale with log(component size), not diameter. A
    256-vertex CHAIN (diameter 255 — the propagation algorithm's
    worst case, which raised at its default max_iter=20) must converge
    in <= ~2*log2(n) alternation rounds."""
    import math

    from data_engineering_pipeline_spark.operators.graph import (
        _alternating_components,
    )

    n = 256
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels, rounds = _alternating_components(
        verts, edges, "id", "src", "dst", max_iter=40
    )
    got = {r.id: r.component for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 2 * int(math.log2(n))  # 16 for n=256


def test_cc_star_matches_propagation_on_random_graphs(spark):
    """r10 property test: the star algorithm's labels equal the
    independent min-label-propagation implementation's on random
    sparse graphs (mixed singletons, stars, chains, cycles, dense
    blobs — whatever the sampler produces)."""
    import random

    from data_engineering_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_propagation,
    )

    rng = random.Random(0xC0C0)
    for trial in range(6):
        n = rng.randint(1, 60)
        m = rng.randint(0, 2 * n)
        verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ] or [(0, 0)]
        edges = spark.createDataFrame(pairs, "src long, dst long")
        star = {
            r.id: r.component
            for r in connected_components(verts, edges).collect()
        }
        prop = {
            r.id: r.component
            for r in connected_components_propagation(
                verts, edges, max_iter=n + 1
            ).collect()
        }
        assert star == prop, f"trial {trial}: {sorted(pairs)}"


def test_pagerank_empty_edges_returns_empty(spark):
    """r10 review: an empty edge set (a filtered subgraph that matched
    nothing) must return the empty (node, p) frame, not crash with
    ZeroDivisionError on the driver."""
    from data_engineering_pipeline_spark.operators.graph import (
        pagerank_quantized,
    )

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank_quantized(edges)
    assert out.columns == ["node", "p"]
    assert out.count() == 0


def test_star_forest_fixed_point_test_is_exact(spark):
    """r14: convergence is now detected by the direct star-forest
    fixed-point test (operators/graph.py _is_star_forest) instead of
    running a full confirming round — the test must be EXACT in both
    directions on the oriented edge shape the loop maintains."""
    from data_engineering_pipeline_spark.operators.graph import (
        _is_star_forest,
    )

    def _e(rows):
        return spark.createDataFrame(rows, "a long, b long")

    # depth-1 stars (centers 0 and 5): fixed point
    assert _is_star_forest(_e([(3, 0), (4, 0), (7, 5), (9, 5)]))
    # empty edge set: trivially a forest
    assert _is_star_forest(_e([]).filter("a > 100"))
    # chain 2-1-0 oriented (a > b): 1 appears as child AND center
    assert not _is_star_forest(_e([(1, 0), (2, 1)]))
    # duplicate child: 4 has two parents
    assert not _is_star_forest(_e([(4, 0), (4, 1)]))


def test_cc_pair_graph_converges_in_one_round(spark):
    """r14: disjoint near-dup PAIRS (the dominant dedup-graph shape)
    are one large-star/small-star round from the fixed point; the old
    fingerprint protocol still paid a second, confirming round plus an
    exceptAll job. Pin the round count so the saving is structural,
    not incidental."""
    from data_engineering_pipeline_spark.operators.graph import (
        _alternating_components,
    )

    verts = spark.createDataFrame([(i,) for i in range(8)], "id long")
    edges = spark.createDataFrame(
        [(1, 0), (3, 2), (5, 4)], "src long, dst long"
    )
    labels, rounds = _alternating_components(
        verts, edges, "id", "src", "dst", max_iter=40
    )
    assert rounds == 1
    got = {r.id: r.component for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 4: 4, 5: 4, 6: 6, 7: 7}
