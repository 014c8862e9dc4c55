"""salted_join + canonical election unit tests."""

from pyspark.sql import functions as F

from fuzzy_matcher_spark.operators.canonical import elect_canonical, keep_canonical
from fuzzy_matcher_spark.operators.pairs import salted_join


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(i % 3, i) for i in range(200)], "k long, v long"
    )
    right = spark.createDataFrame([(0, "a"), (1, "b"), (9, "z")], "k long, w string")
    plain = {(r.k, r.v, r.w) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.v, r.w) for r in salted_join(left, right, "k", salt=8).collect()}
    assert salted == plain
    assert len(plain) > 100


def test_elect_and_keep_canonical(spark):
    docs = spark.createDataFrame(
        [
            (1, "short"),
            (2, "a much longer document body"),
            (3, "a much longer document bod!"),  # same length as 2
            (10, "solo"),
        ],
        "doc_id long, text string",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10)], "doc_id long, cluster_id long"
    )
    canon = {r.cluster_id: r.canonical_id for r in
             elect_canonical(clusters, docs).collect()}
    # longest text wins; length tie -> smallest id (neg_id max)
    assert canon == {1: 2, 10: 10}
    kept = sorted(r.doc_id for r in keep_canonical(clusters, docs).collect())
    assert kept == [2, 10]


def test_capped_pairs_large_cap_path_equivalent(spark):
    """The O(cap)-per-row two-step explode (cap > 256) must emit the
    same pair set as the flattened-combos path (cap <= 256), including
    star pairs for buckets above the cap."""
    import fuzzy_matcher_spark.operators.pairs as P
    from pyspark.sql import functions as F

    rows = [("k1", i) for i in range(9)] + [("k2", 100), ("k2", 101)] + [
        ("k3", 207), ("k3", 203), ("k3", 205), ("k3", 211)
    ] + [("solo", 42)]
    idx = spark.createDataFrame(rows, "bk string, doc_id long")

    def pairs_with(cap):
        return {
            (r.a, r.b)
            for r in P.capped_self_join_pairs(idx, ["bk"], "doc_id", cap).collect()
        }

    small = pairs_with(16)                      # flattened-combos path
    orig = P._FLAT_COMBOS_MAX_CAP
    try:
        P._FLAT_COMBOS_MAX_CAP = 1              # force two-step explode
        big = pairs_with(16)
    finally:
        P._FLAT_COMBOS_MAX_CAP = orig
    assert small == big and all(a < b for a, b in small)
    # k1 has 9*8/2=36 pairs, k3 has 6, k2 has 1
    assert len(small) == 43
    assert {(203, 205), (203, 207), (203, 211), (205, 207)} <= small

    # capped bucket (k1 > cap=4) -> star pairs keep connectivity
    capped = pairs_with(4)
    assert {(100, 101)} <= capped
    assert {(0, i) for i in range(1, 9)} <= capped  # k1 star, hub=0


def test_capped_pairs_payload_rides_through(spark):
    """payload= carries the per-id column through every branch (small
    flattened-combos, two-step explode, star) with the same (a, b) set
    as the payload-free call and payloads equal to a join-back."""
    import fuzzy_matcher_spark.operators.pairs as P

    rows = [("k1", i) for i in range(9)] + [("k2", 100), ("k2", 101)] + [
        ("k3", 207), ("k3", 203), ("k3", 205), ("k3", 211)
    ] + [("solo", 42)]
    idx = spark.createDataFrame(rows, "bk string, doc_id long").withColumn(
        "fp", F.col("doc_id") * 1000 + 7
    )

    def run(cap, flat_max=None):
        orig = P._FLAT_COMBOS_MAX_CAP
        try:
            if flat_max is not None:
                P._FLAT_COMBOS_MAX_CAP = flat_max
            return {
                (r.a, r.b, r.fp_a, r.fp_b)
                for r in P.capped_self_join_pairs(
                    idx, ["bk"], "doc_id", cap, payload="fp"
                ).collect()
            }
        finally:
            P._FLAT_COMBOS_MAX_CAP = orig

    bare = {
        (r.a, r.b)
        for r in P.capped_self_join_pairs(idx, ["bk"], "doc_id", 16).collect()
    }
    for got in (run(16), run(16, flat_max=1)):  # both small-bucket paths
        assert {(a, b) for a, b, *_ in got} == bare
        assert all(pa == a * 1000 + 7 and pb == b * 1000 + 7
                   for a, b, pa, pb in got)

    star = run(4)  # k1 capped -> hub payload from the window min_by
    assert {(a, b) for a, b, *_ in star} >= {(0, i) for i in range(1, 9)}
    assert all(pa == a * 1000 + 7 and pb == b * 1000 + 7
               for a, b, pa, pb in star)


def test_simhash_fused_verify_matches_join_verify(spark):
    """simhash_candidate_pairs(with_fingerprints=True) + join-free
    verify must equal the legacy bare-pairs + two-join verify on real
    near-dup docs."""
    from fuzzy_matcher_spark.config import DedupConfig
    from fuzzy_matcher_spark.operators.dedup_simhash import (
        add_fingerprints,
        simhash_candidate_pairs,
        simhash_verify,
    )
    from fuzzy_matcher_spark.sources.synth import synthetic_docs

    cfg = DedupConfig(shingle_mode="word", shingle_size=4)
    fp = add_fingerprints(synthetic_docs(spark, 2000, 40), cfg).persist()
    fused = simhash_verify(simhash_candidate_pairs(fp, cfg), fp, cfg)
    legacy = simhash_verify(
        simhash_candidate_pairs(fp, cfg, with_fingerprints=False), fp, cfg
    )
    got = {(r.a, r.b, r.hamming) for r in fused.collect()}
    want = {(r.a, r.b, r.hamming) for r in legacy.collect()}
    assert got == want and len(got) > 10
    fp.unpersist()
