"""Benchmark decontamination: planted-contamination semantics, bloom
prefilter equivalence (zero false negatives), short-doc fallback, and
null/empty robustness."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuzzy_matcher_spark.operators.decontaminate import (
    _bloom_bits,
    contamination_hits,
    decontaminate,
)

WORDS = [f"w{i}" for i in range(40)]
SPAN = " ".join(WORDS[:13])  # an exact 13-token benchmark span


def _corpus(spark):
    rows = [
        # benchmark docs
        (0, SPAN + " " + " ".join(WORDS[20:30])),
        (1, " ".join(WORDS[25:39])),
        # contaminated: contains the full 13-token span mid-document
        (100, "alpha beta " + SPAN + " gamma delta"),
        # 12-token overlap only -> clean at n=13
        (101, "alpha beta " + " ".join(WORDS[:12]) + " zzz gamma"),
        # clean
        (102, "totally unrelated text with different words entirely here now ok fine yes"),
        # short doc (< 13 tokens), exact copy of a short benchmark?
        (103, " ".join(WORDS[25:39])),  # 14 tokens; shares 13-grams with doc 1
        (104, ""),  # empty
        (105, None),  # null
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_hits_plants(spark):
    docs = _corpus(spark)
    bench = docs.where(F.col("doc_id") < 2)
    corpus = docs.where(F.col("doc_id") >= 100)
    hits = {
        r.doc_id: r.n_hit_grams
        for r in contamination_hits(corpus, bench, n=13).collect()
    }
    assert 100 in hits and hits[100] >= 1
    assert 101 not in hits  # 12-token overlap is below n
    assert 102 not in hits
    assert 103 in hits  # shares the 13-grams of benchmark doc 1
    assert 104 not in hits and 105 not in hits


def test_decontaminate_keeps_clean_docs(spark):
    docs = _corpus(spark)
    bench = docs.where(F.col("doc_id") < 2)
    corpus = docs.where(F.col("doc_id") >= 100)
    kept = sorted(r.doc_id for r in decontaminate(corpus, bench, n=13).collect())
    assert kept == [101, 102, 104, 105]


def test_bloom_prefilter_equals_exact(spark):
    """Bloom on == bloom off (the filter may pass extra docs to the
    exact join but can never drop a contaminated one)."""
    docs = _corpus(spark)
    bench = docs.where(F.col("doc_id") < 2)
    corpus = docs.where(F.col("doc_id") >= 100)
    on = sorted(
        (r.doc_id, r.n_hit_grams)
        for r in contamination_hits(corpus, bench, bloom_prefilter=True).collect()
    )
    off = sorted(
        (r.doc_id, r.n_hit_grams)
        for r in contamination_hits(corpus, bench, bloom_prefilter=False).collect()
    )
    assert on == off


def test_bloom_bits_no_false_negatives():
    rng = np.random.RandomState(7)
    hashes = rng.randint(-(1 << 62), 1 << 62, size=5000, dtype=np.int64)
    bits = _bloom_bits(hashes, bits_log2=20, k=4)
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    mask = np.uint64((1 << 20) - 1)
    present = np.ones(len(h), dtype=bool)
    for i in range(4):
        idx = (h1 + np.uint64(i) * h2) & mask
        present &= (bits[idx >> np.uint64(6)] >> (idx & np.uint64(63))) & np.uint64(1) != 0
    assert present.all()


def test_bloom_cap_overflow_falls_back_to_join(spark):
    """A benchmark too large to bloom skips the prefilter (bounded
    driver collect) and the exact join alone gives the same answer."""
    docs = _corpus(spark)
    bench = docs.where(F.col("doc_id") < 2)
    corpus = docs.where(F.col("doc_id") >= 100)
    capped = sorted(
        (r.doc_id, r.n_hit_grams)
        for r in contamination_hits(
            corpus, bench, bloom_prefilter=True, bloom_max_grams=1
        ).collect()
    )
    plain = sorted(
        (r.doc_id, r.n_hit_grams)
        for r in contamination_hits(corpus, bench, bloom_prefilter=False).collect()
    )
    assert capped == plain and len(capped) > 0


def test_empty_benchmark_flags_nothing(spark):
    docs = _corpus(spark)
    bench = docs.where(F.lit(False))
    corpus = docs.where(F.col("doc_id") >= 100)
    assert contamination_hits(corpus, bench).count() == 0
    assert decontaminate(corpus, bench).count() == corpus.count()


def test_short_doc_whole_string_gram(spark):
    """Docs shorter than n tokens contribute their whole token string
    as ONE gram (shingles.py fallback) — an exact short-doc copy of a
    short benchmark doc is flagged; a superset is not."""
    rows = [
        (0, "tiny bench doc here"),
        (100, "tiny bench doc here"),  # exact copy -> same whole-string gram
        (101, "tiny bench doc here plus extra"),  # different whole-string gram
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where(F.col("doc_id") == 0)
    corpus = docs.where(F.col("doc_id") >= 100)
    got = {r.doc_id for r in contamination_hits(corpus, bench, n=13).collect()}
    assert got == {100}
