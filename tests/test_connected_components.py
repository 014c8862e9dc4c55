"""Connected components: large-star/small-star vs union-find oracle.

The key tests run BOTH paths: the driver union-find fast path
(default cap) and the distributed star loop (driver_max_edges=0).
"""

import random

import pytest

from pyspark.sql import functions as F

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


@pytest.mark.parametrize("cap", [1_000_000, 0], ids=["driver", "stars"])
def test_cc_simple(spark, cap):
    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df, driver_max_edges=cap).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}  # self-loop dropped


@pytest.mark.parametrize("cap", [1_000_000, 0], ids=["driver", "stars"])
def test_cc_long_chain(spark, cap):
    """Path graph — worst case for naive propagation; star algorithms
    converge in O(log n) rounds."""
    n = 200
    edges = [(i, i + 1) for i in range(n - 1)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df, driver_max_edges=cap).collect()}
    assert set(got.values()) == {0}
    assert len(got) == n


@pytest.mark.parametrize("cap", [1_000_000, 0], ids=["driver", "stars"])
def test_cc_random_vs_union_find(spark, cap):
    rng = random.Random(123)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r.id: r.component for r in connected_components(df, driver_max_edges=cap).collect()}
    oracle = _uf_components(n, edges)
    nodes_in_edges = {x for e in edges for x in e if e[0] != e[1]}
    for node in nodes_in_edges:
        assert got[node] == oracle[node], node


@pytest.mark.parametrize("cap", [1_000_000, 0], ids=["driver", "stars"])
def test_cc_mega_star(spark, cap):
    """Skewed mega-cluster: one hub connected to 2000 nodes."""
    edges = [(0, i) for i in range(1, 2001)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = connected_components(df, driver_max_edges=cap)
    assert got.where("component != 0").count() == 0
    assert got.count() == 2001


def test_incremental_components_equals_full_recompute(spark):
    """SURVEY §3.3 / r4 VERDICT #7: folding pair micro-batches through
    incremental_components (restricted CC re-run) must equal the full
    batch recompute — exercised on the real pipeline's verified pairs
    at 10k docs, split into 4 arrival epochs."""
    from fuzzy_matcher_spark.config import DedupConfig
    from fuzzy_matcher_spark.operators.connected_components import (
        incremental_components,
    )
    from fuzzy_matcher_spark.operators.dedup_minhash import (
        add_signatures,
        candidate_pairs,
        verify_pairs,
    )
    from fuzzy_matcher_spark.sources.synth import synthetic_docs

    cfg = DedupConfig(shingle_mode="word", shingle_size=4, jaccard_threshold=0.8)
    docs = synthetic_docs(spark, 10_000, 60)
    sig = add_signatures(docs, cfg).persist()
    pairs = (
        verify_pairs(candidate_pairs(sig, cfg), sig, cfg)
        .select("a", "b")
        .persist()
    )
    assert pairs.count() > 100  # non-vacuous: planted dups produce pairs

    full = connected_components(pairs)

    prev = spark.createDataFrame([], "id long, component long")
    for epoch in range(4):
        # pmod, not %: xxhash64 is signed and Spark's % keeps the
        # dividend's sign, so `% 4 == epoch` would silently drop every
        # negative-hash pair from all four epochs
        batch = pairs.where(F.pmod(F.xxhash64("a", "b"), F.lit(4)) == epoch)
        prev = incremental_components(prev, batch).localCheckpoint()

    got = {(r.id, r.component) for r in prev.collect()}
    want = {(r.id, r.component) for r in full.collect()}
    assert got == want
    sig.unpersist()
    pairs.unpersist()


def test_incremental_components_untouched_rows_survive(spark):
    """Components with no touched node keep their assignment verbatim;
    brand-new nodes in the batch get assigned."""
    from fuzzy_matcher_spark.operators.connected_components import (
        incremental_components,
    )

    prev = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (11, 10)], "id long, component long"
    )
    new = spark.createDataFrame([(11, 99), (100, 101)], "a long, b long")
    got = {(r.id, r.component) for r in incremental_components(prev, new).collect()}
    assert got == {
        (1, 1), (2, 1),            # untouched component
        (10, 10), (11, 10), (99, 10),   # 99 merges into component 10
        (100, 100), (101, 100),    # brand-new pair
    }


def test_cc_cap_overflow_falls_back_to_stars(spark):
    """An edge set one past the cap takes the distributed loop and
    still matches the union-find oracle."""
    rng = random.Random(7)
    n = 60
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(59)]
    df = spark.createDataFrame(edges, "a long, b long")
    small_cap = connected_components(df, driver_max_edges=5)
    default = connected_components(df)
    a = {r.id: r.component for r in small_cap.collect()}
    b = {r.id: r.component for r in default.collect()}
    assert a == b
