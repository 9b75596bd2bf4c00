"""Connected components on known graph shapes."""

from __future__ import annotations

from imdedup_plus_spark.clustering import connected_components


def _run(spark, node_ids, edge_pairs):
    nodes = spark.createDataFrame([(n,) for n in node_ids], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs] or [(None, None)], "id_a long, id_b long"
    )
    if not edge_pairs:
        edges = edges.where("id_a IS NOT NULL")
    out = connected_components(nodes, edges, "id")
    return {r.id: r.cluster_id for r in out.collect()}


def test_triangle_plus_singleton(spark):
    got = _run(spark, [1, 2, 3, 9], [(1, 2), (2, 3), (1, 3)])
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_long_chain_converges(spark):
    n = 12
    got = _run(spark, list(range(1, n + 1)), [(i, i + 1) for i in range(1, n)])
    assert set(got.values()) == {1}


def test_two_components(spark):
    got = _run(spark, [1, 2, 3, 10, 11], [(2, 3), (10, 11)])
    assert got == {1: 1, 2: 2, 3: 2, 10: 10, 11: 10}


def test_no_edges_all_singletons(spark):
    got = _run(spark, [5, 6, 7], [])
    assert got == {5: 5, 6: 6, 7: 7}
