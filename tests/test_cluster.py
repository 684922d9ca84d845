"""Connected-components unit tests on hand-drawn graphs
(the method of SURVEY.md §5: exact expected outputs on tiny inputs)."""

from __future__ import annotations

from annoy_spark.operators.cluster import connected_components


def _labels(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges, "u long, v long")
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long") if nodes else None
    out = connected_components(e, n, **kw).collect()
    return {r.doc_id: r.cluster_id for r in out}


def test_two_components_and_chain(spark):
    # component {1,2,3} via chain, component {10,11}
    got = _labels(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_logarithmically(spark):
    edges = [(i, i + 1) for i in range(30)]
    got = _labels(spark, edges, max_iters=10)  # would fail if O(diameter)
    assert set(got.values()) == {0}
    assert len(got) == 31


def test_singletons_and_self_loops(spark):
    got = _labels(spark, [(5, 5), (1, 2)], nodes=[1, 2, 5, 9])
    assert got == {1: 1, 2: 1, 5: 5, 9: 9}


def test_duplicate_and_reversed_edges(spark):
    got = _labels(spark, [(2, 1), (1, 2), (2, 1), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_star_and_triangle(spark):
    got = _labels(spark, [(100, 7), (100, 8), (100, 9), (7, 8)])
    assert got == {100: 7, 7: 7, 8: 7, 9: 7}


def test_deterministic_vs_partitioning(spark):
    edges = [(i, (i * 7) % 50) for i in range(50) if i != (i * 7) % 50]
    e1 = spark.createDataFrame(edges, "u long, v long").repartition(1)
    e8 = spark.createDataFrame(list(reversed(edges)), "u long, v long").repartition(8)
    l1 = {r.doc_id: r.cluster_id for r in connected_components(e1).collect()}
    l8 = {r.doc_id: r.cluster_id for r in connected_components(e8).collect()}
    assert l1 == l8
