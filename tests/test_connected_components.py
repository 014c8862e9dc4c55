"""Connected components: large-star/small-star vs union-find oracle."""

import random

from fuzzy_matcher_spark.operators.connected_components import connected_components


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


def test_cc_simple(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}  # self-loop dropped


def test_cc_long_chain(spark):
    """Path graph — worst case for naive propagation; star algorithms
    converge in O(log n) rounds."""
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n


def test_cc_random_vs_union_find(spark):
    rng = random.Random(123)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    oracle = _uf_components(n, edges)
    nodes_in_edges = {x for e in edges for x in e if e[0] != e[1]}
    for node in nodes_in_edges:
        assert got[node] == oracle[node], node


def test_cc_mega_star(spark):
    """Skewed mega-cluster: one hub connected to 2000 nodes."""
    edges = [(0, i) for i in range(1, 2001)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = connected_components(df)
    assert got.where("component != 0").count() == 0
    assert got.count() == 2001
