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
