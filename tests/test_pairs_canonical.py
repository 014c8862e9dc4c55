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
