"""Property-based kernel tests (hypothesis) — no Spark session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from fuzzy_matcher_spark.functions.similarity import (
    jaro_winkler,
    levenshtein,
    levenshtein_sim,
    trie_edit_distance,
)
from fuzzy_matcher_spark.operators.suffix_array import build_suffix_array

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789", max_size=12)


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_jw_range_and_symmetry_of_perfection(a, b):
    v = jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    if a and a == b:
        assert v == 1.0
    if not a or not b:
        assert v == 0.0


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_levenshtein_metric_properties(a, b):
    d = levenshtein(a, b)
    assert d == levenshtein(b, a)
    assert (d == 0) == (a == b)
    assert d <= max(len(a), len(b))
    assert 0.0 <= levenshtein_sim(a, b) <= 1.0


@given(words, words, st.text(alphabet="abcdefghijklmnopqrstuvwxyz", max_size=4))
@settings(max_examples=100, deadline=None)
def test_lev_triangle(a, b, c):
    assert levenshtein(a, c) <= levenshtein(a, b) + levenshtein(b, c)


@given(words, words)
@settings(max_examples=200, deadline=None)
def test_trie_edits_bounded_by_levenshtein(a, b):
    """Free suffixes only ever reduce cost; OCR only adds transitions."""
    t = trie_edit_distance(a, b)
    assert 0 <= t <= levenshtein(a, b)
    assert trie_edit_distance(a, b, ocr=True) <= t
    # prefix extension of the stored value is free (completion)
    assert trie_edit_distance(a, a + "suffix") == 0


@given(st.lists(st.integers(min_value=0, max_value=7), min_size=2, max_size=400))
@settings(max_examples=60, deadline=None)
def test_suffix_array_is_sorted_suffix_order(codes):
    s = np.asarray(codes, dtype=np.int64)
    sa = build_suffix_array(s)
    assert sorted(sa.tolist()) == list(range(len(s)))
    lst = s.tolist()
    for i in range(len(sa) - 1):
        assert lst[sa[i] :] <= lst[sa[i + 1] :]


def test_minhash_estimates_jaccard():
    """128-perm MinHash agreement concentrates around true Jaccard."""
    from fuzzy_matcher_spark.functions.minhash import _perm_coeffs, minhash_kernel

    rng = np.random.RandomState(3)
    a, b = _perm_coeffs(128, 42)
    a_col, b_col = a[:, None], b[:, None]

    def sig(items):
        x = np.asarray(sorted(items), dtype=np.uint64)
        return minhash_kernel(x, a_col, b_col)

    base = set(rng.randint(0, 1 << 31, 400).tolist())
    drop = set(list(base)[:80])
    other = base - drop | set(rng.randint(0, 1 << 31, 80).tolist())
    true_j = len(base & other) / len(base | other)
    est = float((sig(base) == sig(other)).mean())
    assert abs(est - true_j) < 0.12


@given(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.sets(st.integers(min_value=0, max_value=63), max_size=3),
)
@settings(max_examples=200, deadline=None)
def test_simhash_pigeonhole(base_fp, flip_bits):
    """Any pair within Hamming distance tables-1 (=3 flips at 4 tables)
    shares at least one full 16-bit slice — the candidate-generation
    guarantee of operators/dedup_simhash.py."""
    other = base_fp
    for b in flip_bits:
        other ^= 1 << b
        if other >= 2**63:
            other -= 2**64
    tables, width = 4, 16
    mask = (1 << width) - 1

    def slices(fp):
        u = fp & (2**64 - 1)
        return [(u >> (t * width)) & mask for t in range(tables)]

    sa, sb = slices(base_fp), slices(other)
    assert any(x == y for x, y in zip(sa, sb))


def test_simhash_udf_matches_pure_python_reference(spark):
    """Cross-engine pin: an independently written pure-Python SimHash
    over the same JVM xxhash64 shingle hashes must reproduce the
    pandas-UDF fingerprints bit-for-bit (VERDICT r1 item 9)."""
    from pyspark.sql import functions as F

    from fuzzy_matcher_spark.functions.shingles import (
        shingle_hashes_col,
        shingles_col,
    )
    from fuzzy_matcher_spark.functions.simhash import simhash64_udf

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "pack my box with five dozen liquor jugs tonight ok"),
        (3, "a b c d e f g h i j k l m n o p"),
        (4, "sphinx of black quartz judge my vow said the sphinx of black"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string").select(
        "doc_id",
        shingle_hashes_col(shingles_col("text", "word", 4)).alias("h"),
    )
    rows = df.withColumn("fp", simhash64_udf("h")).collect()

    def py_simhash(hashes):
        votes = [0] * 64
        for h in hashes:
            u = h & 0xFFFFFFFFFFFFFFFF  # two's complement view
            for j in range(64):
                votes[j] += 1 if (u >> j) & 1 else -1
        fp = 0
        for j in range(64):
            if votes[j] > 0:
                fp |= 1 << j
        return fp - (1 << 64) if fp >= 1 << 63 else fp  # back to int64

    for r in rows:
        assert r.fp == py_simhash(r.h), r.doc_id


def test_minhash_udf_matches_pure_python_reference(spark):
    """Cross-engine pin for the python half of the signature path: an
    independently written pure-Python multiply-shift MinHash over
    LITERAL gram arrays must reproduce the pandas-UDF signatures
    bit-for-bit (incl. duplicate-gram invariance and the empty-set
    sentinel)."""
    from pyspark.sql import functions as F

    from fuzzy_matcher_spark.functions.minhash import _perm_coeffs, minhash_udf

    num_perm, seed = 32, 42
    rows = [
        (1, [3, 1 << 62, -5, 3, 7]),          # duplicates included
        (2, [0]),
        (3, [-(1 << 63), (1 << 63) - 1]),
        (4, []),                               # empty -> sentinel
    ]
    df = spark.createDataFrame(rows, "doc_id long, grams array<long>")
    got = {
        r.doc_id: list(r.sig)
        for r in df.select(
            "doc_id", minhash_udf(num_perm, seed)(F.col("grams")).alias("sig")
        ).collect()
    }

    MASK = (1 << 64) - 1
    a, b = _perm_coeffs(num_perm, seed)

    def py_sig(grams):
        if not grams:
            return [(1 << 63) - 1] * num_perm
        us = [g & MASK for g in grams]
        return [
            min(((ai * g + bi) & MASK) for g in us) >> 32
            for ai, bi in zip(a.tolist(), b.tolist())
        ]

    for doc_id, grams in rows:
        assert got[doc_id] == py_sig(grams), doc_id
    # duplicate invariance: multiset and set inputs agree
    assert py_sig([3, 1 << 62, -5, 3, 7]) == py_sig([3, 1 << 62, -5, 7])


def test_fused_minhash_udf_matches_pure_python_reference(spark):
    """Cross-engine pin for the fused word path: an independently
    written pure-Python reference (explicit per-gram polynomial mix
    over Spark-computed token hashes, set(), then a per-permutation
    multiply-shift min loop) must reproduce the pandas-UDF shingle
    sets AND signatures bit-for-bit; the sig-only and sets-only UDFs
    must agree with the fused struct."""
    from pyspark.sql import functions as F

    from fuzzy_matcher_spark.functions.minhash import (
        _GRAM_MIX,
        _perm_coeffs,
        token_gram_minhash_udf,
        token_gram_sets_udf,
        token_gram_sig_udf,
    )
    from fuzzy_matcher_spark.functions.shingles import token_hashes_col

    texts = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "a b"),  # shorter than n: one gram mixing all tokens
        (3, "Sphinx of black quartz, judge my vow! said the sphinx of black"),
        (4, "one two three four one two three four one two three four"),
    ]
    n, num_perm, seed = 4, 32, 42
    df = spark.createDataFrame(texts, "doc_id long, text string").select(
        "doc_id", token_hashes_col("text").alias("th")
    )
    fused = token_gram_minhash_udf(num_perm, seed, n)
    sig_only = token_gram_sig_udf(num_perm, seed, n)
    sets_only = token_gram_sets_udf(n)
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            "th",
            fused(F.col("th")).alias("s"),
            sig_only(F.col("th")).alias("sig2"),
            sets_only(F.col("th")).alias("sh2"),
        ).collect()
    }

    MASK = (1 << 64) - 1
    mix = int(_GRAM_MIX)
    a, b = _perm_coeffs(num_perm, seed)

    def py_grams(tok_hashes):
        ts = [h & MASK for h in tok_hashes]  # two's-complement view
        windows = (
            [ts[i : i + n] for i in range(len(ts) - n + 1)]
            if len(ts) >= n
            else [ts]
        )
        out = set()
        for w in windows:
            h = w[0]
            for t in w[1:]:
                h = (h * mix + t) & MASK
            out.add(h)
        return sorted(out)

    def py_sig(grams):
        return [
            min(((ai * g + bi) & MASK) for g in grams) >> 32
            for ai, bi in zip(a.tolist(), b.tolist())
        ]

    def to_signed(u):
        return u - (1 << 64) if u >= 1 << 63 else u

    for doc_id, r in rows.items():
        grams = py_grams(r.th)
        assert [to_signed(g) for g in grams] == list(r.s.shingle_hashes), doc_id
        assert py_sig(grams) == list(r.s.signature), doc_id
        # split UDFs agree with the fused struct
        assert list(r.sig2) == list(r.s.signature), doc_id
        assert list(r.sh2) == list(r.s.shingle_hashes), doc_id


def test_fake_features_matches_pure_python_reference(spark):
    """media_features pin (r4 VERDICT #6): the numpy byte-statistics
    featureizer behind the `media_features` digest, re-implemented in
    pure Python (no numpy), must agree (a) to 2e-6 on every component
    and (b) EXACTLY at the digest's round-to-5-decimals precision on
    the real sf0.001 documents — so the rows-only driver query now has
    an independent second implementation, the same pattern as the
    SimHash/MinHash pins above."""
    import math
    import struct as _s

    from pyspark.sql import functions as F

    from fuzzy_matcher_spark.operators.multimodal import _fake_features

    def f32(x: float) -> float:
        return _s.unpack("f", _s.pack("f", x))[0]

    def fake_features_py(raw: bytes) -> list:
        b = list(raw) if raw else [0]
        hist = [0.0] * 32
        for x in b:
            hist[x % 32] += 1.0
        n = len(b)
        k, m = divmod(n, 32)
        means, pos = [], 0
        for i in range(32):
            sz = k + (1 if i < m else 0)
            c = b[pos : pos + sz]
            pos += sz
            means.append(f32(math.fsum(c) / sz) if sz else 0.0)
        v = [f32(x) for x in hist] + means
        norm = math.sqrt(math.fsum(x * x for x in v))
        if norm > 0:
            v = [f32(x / f32(norm)) for x in v]
        return v

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(60)
        .collect()
    )
    payloads = [(r.doc_id, (r.text or "").encode("utf-8")) for r in docs]
    payloads += [(10_001, b""), (10_002, b"\x00\x01\x02"), (10_003, bytes(range(256)) * 3)]

    for _id, raw in payloads:
        got = _fake_features(raw)
        want = fake_features_py(raw)
        assert len(got) == len(want) == 64
        diffs = [abs(float(g) - w) for g, w in zip(got, want)]
        assert max(diffs) < 2e-6, (_id, max(diffs))
        # exact agreement at the digest's precision
        assert [round(float(g), 5) for g in got] == [
            round(w, 5) for w in want
        ], _id

    # end-to-end: the pure-python vectors, pushed through the SAME
    # digest expression, reproduce q_media_features' digests
    import __spark_entry__ as E

    ids = [p[0] for p in payloads if p[0] <= 10_000]
    spark_digest = {
        r.media_id: r.feature_digest
        for r in E.queries()["media_features"](spark, "/root/testdata/sf0.001")
        .where(F.col("media_id").isin(ids))
        .collect()
    }
    py_feats = spark.createDataFrame(
        [(i, fake_features_py(raw)) for i, raw in payloads if i <= 10_000],
        "media_id long, feature array<float>",
    )
    digest = F.xxhash64(
        F.concat_ws(
            ",",
            F.transform(
                "feature", lambda x: F.round(x.cast("double"), 5).cast("string")
            ),
        )
    )
    py_digest = {
        r.media_id: r.d
        for r in py_feats.select("media_id", digest.alias("d")).collect()
    }
    assert spark_digest == py_digest
