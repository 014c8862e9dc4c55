"""Skew stress: mega boilerplate families through the dedup pipeline.

10,000 byte-identical docs create (a) one mega exact-dup family,
(b) saturated LSH band buckets in every band. The bucket cap must keep
pair counts LINEAR (chain pairs), CC must resolve one cluster, and the
run must complete in bounded time.
"""

import time

from pyspark.sql import functions as F

from fuzzy_matcher_spark.config import DedupConfig
from fuzzy_matcher_spark.operators.dedup_minhash import (
    add_signatures,
    candidate_pairs,
    minhash_dedup,
)

CFG = DedupConfig(shingle_mode="word", shingle_size=4, jaccard_threshold=0.8)


def _mega_corpus(spark, n_dup=10_000, n_unique=500):
    dup = spark.range(n_dup).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "the same boilerplate page body repeated verbatim across the "
            "whole crawl with cookie banner and footer text included"
        ).alias("text"),
    )
    uniq = spark.range(n_dup, n_dup + n_unique).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("unique document number "),
            F.col("id"),
            F.lit(" with its own words and content payload entirely distinct "),
            F.sha2(F.col("id").cast("string"), 256),
        ).alias("text"),
    )
    return dup.union(uniq)


def test_mega_band_buckets_stay_linear(spark):
    docs = _mega_corpus(spark)
    sig = add_signatures(docs, CFG).persist()
    pairs = candidate_pairs(sig, CFG)
    n_pairs = pairs.count()
    # all-pairs would be ~50M; chain capping keeps it near-linear:
    # <= (n_dup per band-chain) * bands + small-bucket pairs
    assert n_pairs < 300_000, n_pairs
    sig.unpersist()


def test_mega_cluster_resolves(spark):
    docs = _mega_corpus(spark, n_dup=5_000, n_unique=200)
    t0 = time.perf_counter()
    clusters = minhash_dedup(docs, CFG)
    agg = (
        clusters.groupBy("cluster_id")
        .count()
        .orderBy(F.desc("count"))
        .limit(2)
        .collect()
    )
    wall = time.perf_counter() - t0
    assert agg[0]["count"] == 5_000  # one mega-cluster
    assert agg[1]["count"] == 1  # uniques stay singletons
    assert wall < 240, f"skew run took {wall:.0f}s"
