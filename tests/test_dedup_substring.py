"""Substring dedup: winnowing guarantee + exact LCS verification."""

import numpy as np
import pytest

from fuzzy_matcher_spark.config import DedupConfig
from fuzzy_matcher_spark.operators.dedup_substring import (
    _rolling_hashes,
    _winnow,
    substring_dedup,
    substring_verify,
    substring_candidates,
)

CFG = DedupConfig(min_substring=50)


def _lcs_bruteforce(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_rolling_hash_equality():
    a = np.frombuffer(b"abcdefabcdef", dtype=np.uint8)
    h = _rolling_hashes(a, 6)
    assert h[0] == h[6]  # "abcdef" == "abcdef"
    assert len(set(h.tolist())) == 6


def test_winnow_guarantee():
    """Two strings sharing a >= n+w-1 substring share an anchor."""
    rng = np.random.RandomState(0)
    shared = "".join(chr(97 + rng.randint(0, 26)) for _ in range(80))
    a = "".join(chr(97 + rng.randint(0, 26)) for _ in range(200)) + shared
    b = shared + "".join(chr(97 + rng.randint(0, 26)) for _ in range(150))
    n, w = 20, 31  # guarantee length n+w-1 = 50 <= 80
    ha = _winnow(_rolling_hashes(np.frombuffer(a.encode(), np.uint8), n), w)
    hb = _winnow(_rolling_hashes(np.frombuffer(b.encode(), np.uint8), n), w)
    assert len(np.intersect1d(ha, hb)) > 0


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.RandomState(7)

    def rand_text(n):
        return " ".join(
            "".join(chr(97 + rng.randint(0, 26)) for _ in range(rng.randint(3, 9)))
            for _ in range(n)
        )

    boiler = rand_text(20)  # ~120 chars shared block
    rows = []
    for i in range(20):
        base = rand_text(60)
        rows.append((i * 10, base))
        if i % 3 == 0:  # containment: doc contains a prefix of another
            rows.append((i * 10 + 1, base[: len(base) // 2]))
        if i % 3 == 1:  # shared boilerplate block
            rows.append((i * 10 + 2, boiler + " " + rand_text(40)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_pairs_vs_bruteforce(spark, corpus):
    rows = {r.doc_id: r.text for r in corpus.collect()}
    want = set()
    for a in rows:
        for b in rows:
            if a < b and _lcs_bruteforce(rows[a], rows[b]) >= CFG.min_substring:
                want.add((a, b))

    pairs = substring_candidates(corpus, CFG)
    verified = substring_verify(pairs, corpus, CFG)
    got = {(r.a, r.b) for r in verified.collect()}
    missed = want - got
    assert not missed, f"winnowing guarantee violated: {sorted(missed)[:5]}"
    extra = got - want
    assert not extra, f"false positives: {sorted(extra)[:5]}"
    assert len(want) >= 10


def test_substring_lcs_values(spark, corpus):
    rows = {r.doc_id: r.text for r in corpus.collect()}
    pairs = substring_candidates(corpus, CFG)
    verified = substring_verify(pairs, corpus, CFG).collect()
    for r in verified[:10]:
        assert r.lcs_len == _lcs_bruteforce(rows[r.a], rows[r.b])


def test_substring_dedup_end_to_end(spark, corpus):
    clusters = substring_dedup(corpus, CFG)
    cl = {r.doc_id: r.cluster_id for r in clusters.collect()}
    rows = {r.doc_id: r.text for r in corpus.collect()}
    # containment families co-cluster
    for a in rows:
        for b in rows:
            if a < b and _lcs_bruteforce(rows[a], rows[b]) >= CFG.min_substring:
                assert cl[a] == cl[b], (a, b)


def test_suffix_array_pairs_match_bruteforce(spark, corpus):
    """The SA engine finds exactly the brute-force >= L pairs."""
    from fuzzy_matcher_spark.operators.suffix_array import suffix_substring_pairs

    rows = {r.doc_id: r.text for r in corpus.collect()}
    want = set()
    for a in rows:
        for b in rows:
            if a < b and _lcs_bruteforce(rows[a], rows[b]) >= CFG.min_substring:
                want.add((a, b))
    got = {(r.a, r.b) for r in suffix_substring_pairs(corpus, CFG).collect()}
    assert got == want
