"""Triangle counting (operators/graph.py): hand graphs where the answer
is checkable by eye, orientation-independence, and degenerate inputs."""

from __future__ import annotations

from sparkstreaming_gmall_scala_spark.operators.graph import triangle_counts


def _counts(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


def test_clique_vs_chain(spark):
    # K4 on {1,2,3,4}: every node in C(3,2)=3 triangles; chain 10-11-12-13
    # (no triangle); one extra triangle {20,21,22}
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    chain = [(10, 11), (11, 12), (12, 13)]
    tri = [(20, 21), (21, 22), (20, 22)]
    got = _counts(spark, k4 + chain + tri)
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 20: 1, 21: 1, 22: 1}


def test_orientation_of_input_rows_is_irrelevant(spark):
    # same triangle given with endpoints in every order, plus a
    # duplicate-free check that reversed rows don't double-count
    got = _counts(spark, [(2, 1), (3, 2), (1, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_hub_without_closure_has_no_triangles(spark):
    # star: hub 1 connected to 5 leaves, no leaf-leaf edges
    got = _counts(spark, [(1, k) for k in range(2, 7)])
    assert got == {}


def test_self_loops_ignored(spark):
    got = _counts(spark, [(1, 1), (1, 2), (2, 3), (1, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_duplicate_and_both_order_edges_absorbed(spark):
    """Regression: the same undirected edge delivered duplicated and in
    both orders must count each triangle once, not multiplicatively."""
    noisy = [(1, 2), (2, 1), (1, 2), (2, 3), (3, 2), (1, 3)]
    got = _counts(spark, noisy)
    assert got == {1: 1, 2: 1, 3: 1}
