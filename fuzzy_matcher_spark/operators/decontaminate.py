"""Benchmark decontamination: flag corpus documents that share any
word n-gram with a held-out benchmark/eval set.

The standard training-data hygiene pass (the n-gram overlap rule used
across the public LLM-corpus literature, e.g. 13-gram collision
filtering): any document containing a span that also appears in an
evaluation set must be dropped before training. Generalizes the
reference's notion of "query vs indexed corpus" matching (the matcher
probes an index, fuzzy_matcher_core.go search contract) to span-level
exact containment at corpus scale.

Gram id space (round 6): gram ids are formed NUMERICALLY from the
per-token xxhash64 values — the same degree-(n-1) polynomial mix the
MinHash pipeline uses (functions/minhash.py _mix_grams) — instead of
xxhash64 over JVM-allocated 13-word gram STRINGS. The old
single-expression gram column inlined the tokenizer into the gram
lambda (no CSE for higher-order-function lambdas), and the optimizer
evaluated that expression up to FOUR times per corpus row (inferred
explode filter twice + bloom-UDF input + explode projection) — see
plans/r06/decontaminate_before.txt. Only the ids change; the mapping
gram-string -> int64 stays injective modulo 64-bit collisions, exactly
the reliance the xxhash64 id space already had, so per-document hit
counts (what the oracles compare) are unchanged.

Shape contract and scale story:

- The BENCHMARK side is small by contract (eval sets are thousands of
  documents, not billions). Its distinct gram ids are collected once
  (bounded: ``limit(cap+1).toPandas``, <= 64 MB of int64 at the
  default cap) and broadcast; the corpus is never shuffled.
- The CORPUS side is one scan: per-token xxhash64 (cheap JVM
  expression, one tokenizer pass per row) -> ONE vectorized pandas
  hop that mixes gram ids and counts distinct benchmark hits per doc
  (bloom dismissal of clean docs, exact sorted-array membership for
  bloom survivors — zero false positives AND zero false negatives).
  No explode, no join, no shuffle: the hit report is a pure
  projection+filter over the scan.
- A benchmark too large to collect (> bloom_max_grams distinct grams,
  or ``bloom_prefilter=False``) falls back to the distributed shape:
  gram arrays explode to 8-byte longs and broadcast-equi-join the
  benchmark gram relation; the only shuffle is the per-document hit
  count, sized by CONTAMINATED gram volume (~0 on clean corpora).

Gram semantics match functions/shingles.py word mode exactly
(lowercase, non-alphanumeric-run split, space-joined n-grams, whole
short docs as a single gram) so the DuckDB oracle in
__spark_entry__.py reproduces them from the raw text.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.minhash import _mix_grams
from ..functions.shingles import token_hashes_col

__all__ = [
    "benchmark_gram_hashes",
    "contamination_hits",
    "decontaminate",
]


# Sentinel gram ids for degenerate docs. A null text used to gram to
# {xxhash64(NULL)} and a zero-token text to {xxhash64('')}; in the
# numeric id space they become fixed constants instead. Any constants
# work — gram ids only need to be CONSISTENT between the corpus and
# benchmark sides and injective w.r.t. gram strings (the same 64-bit
# no-collision reliance the xxhash64 id space had).
_NULL_TEXT_GRAM = np.array([-7046029254386353131], dtype=np.int64)
_ZERO_TOKEN_GRAM = np.array([8379871191168913415], dtype=np.int64)


def _doc_grams(token_hashes, n: int) -> np.ndarray:
    """DISTINCT gram ids of one doc from its token-hash array (the
    _mix_grams polynomial; whole-doc gram for docs shorter than n,
    sentinels for null/zero-token docs)."""
    if token_hashes is None:
        return _NULL_TEXT_GRAM
    if len(token_hashes) == 0:
        return _ZERO_TOKEN_GRAM
    t = np.asarray(token_hashes, dtype=np.int64).astype(np.uint64)
    return np.unique(_mix_grams(t, n)).astype(np.int64)


def gram_sets_udf(n: int):
    """pandas UDF: per-token xxhash64 array -> DISTINCT gram ids.
    Marked non-deterministic so the optimizer cannot duplicate the
    evaluation into inferred explode filters (guide §4.4 — the old
    JVM gram expression was evaluated 4x that way)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for tok_hashes in it:
            yield pd.Series([_doc_grams(th, n) for th in tok_hashes])

    return _udf.asNondeterministic()


def benchmark_gram_hashes(
    benchmark: DataFrame, n: int, text_col: str = "text"
) -> DataFrame:
    """Distinct gram-id relation (column ``g``) for the benchmark
    side. Small by contract — intended for broadcast/collection."""
    return benchmark.select(
        F.explode(gram_sets_udf(n)(token_hashes_col(text_col))).alias("g")
    ).distinct()


def _bloom_bits(hashes: np.ndarray, bits_log2: int, k: int) -> np.ndarray:
    """Build a bloom bitset (packed uint64 words) from int64 gram
    hashes. Probe i uses (h1 + i*h2) mod 2^bits_log2 with h1/h2 the
    two 32-bit halves — the standard double-hashing construction, so
    one 64-bit hash funds all k probes."""
    bits = np.zeros(1 << max(bits_log2 - 6, 0), dtype=np.uint64)
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd -> full-period step
    mask = np.uint64((1 << bits_log2) - 1)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & mask
        np.bitwise_or.at(bits, idx >> np.uint64(6), np.uint64(1) << (idx & np.uint64(63)))
    return bits


def _bloom_bits_log2_for(n_keys: int) -> int:
    """~16 bits/key rounded up to a power of two (FPR ~ 5e-4 at k=4),
    clamped to [16, 28] — the ADVICE r5 fix: a fixed 2^24 bitset
    saturated (FPR ~1) at the 8M-gram cap, making the prefilter pure
    overhead exactly when it mattered most."""
    bits = 16 * max(n_keys, 1)
    return max(16, min(28, int(bits - 1).bit_length()))


def hit_count_udf(bench_sorted: np.ndarray, n: int, bits, bits_log2: int, k: int):
    """pandas UDF: per-token xxhash64 array -> count of DISTINCT gram
    ids present in the benchmark gram set (0 for clean docs).

    Vectorized over the whole Arrow batch: all rows' gram ids are
    flattened into one probe array; the bloom bitset (right-sized,
    zero false negatives) dismisses the overwhelmingly-clean stream,
    survivors get EXACT membership via binary search over the sorted
    benchmark array, and verdicts scatter back to their owning row.
    ``bench_sorted``/``bits`` arrive via a real Spark broadcast (one
    fetch per python worker, not per task closure)."""
    mask = np.uint64((1 << bits_log2) - 1) if bits is not None else None

    @F.pandas_udf(T.LongType())
    def _udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        bench = bench_sorted.value if hasattr(bench_sorted, "value") else bench_sorted
        bitset = bits.value if hasattr(bits, "value") else bits
        for tok_hashes in it:
            m = len(tok_hashes)
            grams = [_doc_grams(th, n) for th in tok_hashes]
            lens = np.fromiter((len(g) for g in grams), np.int64, count=m)
            flat = (
                np.concatenate(grams) if m else np.empty(0, np.int64)
            )
            if bitset is not None and len(flat):
                h = flat.astype(np.uint64)
                h1 = h & np.uint64(0xFFFFFFFF)
                h2 = (h >> np.uint64(32)) | np.uint64(1)
                maybe = np.ones(len(flat), dtype=bool)
                for i in range(k):
                    idx = (h1 + np.uint64(i) * h2) & mask
                    maybe &= (
                        bitset[idx >> np.uint64(6)] >> (idx & np.uint64(63))
                    ) & np.uint64(1) != 0
            else:
                maybe = np.ones(len(flat), dtype=bool)
            hit = np.zeros(len(flat), dtype=bool)
            cand = np.nonzero(maybe)[0]
            if len(cand) and len(bench):
                sub = flat[cand]
                pos = np.searchsorted(bench, sub)
                ok = pos < len(bench)
                eq = np.zeros(len(sub), dtype=bool)
                eq[ok] = bench[pos[ok]] == sub[ok]
                hit[cand] = eq
            owner = np.repeat(np.arange(m), lens)
            counts = np.bincount(owner[hit], minlength=m).astype(np.int64)
            yield pd.Series(counts)

    return _udf.asNondeterministic()


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bloom_prefilter: bool = True,
    bloom_bits_log2: int | None = None,
    bloom_k: int = 4,
    bloom_max_grams: int = 8_000_000,
) -> DataFrame:
    """Per-document contamination report: (id, n_hit_grams) for every
    corpus doc sharing >= 1 word n-gram with the benchmark set.

    Default plan (``bloom_prefilter=True``, benchmark fits the cap):
    benchmark gram ids -> distinct -> bounded driver collect
    (``limit(cap+1).toPandas``, CC-style) -> sorted array + bloom
    bitset broadcast; corpus -> token hashes (one cheap JVM pass) ->
    ONE pandas hop that counts exact distinct hits per doc. ZERO
    corpus shuffles — the report is a projection+filter.

    Fallback (``bloom_prefilter=False``, or > cap distinct benchmark
    grams): no driver state at all — gram arrays explode and
    broadcast-equi-join the benchmark gram relation; the only shuffle
    is the per-doc hit count, sized by contaminated gram volume. Both
    paths compute identical results.
    """
    from .dedup_minhash import ensure_parallelism

    bench = benchmark_gram_hashes(benchmark, n, text_col)
    corpus = ensure_parallelism(docs)
    if bloom_prefilter:
        head = bench.limit(bloom_max_grams + 1).toPandas()["g"]
        if len(head) == 0:
            return corpus.select(
                F.col(id_col),
                F.lit(0).cast("long").alias("n_hit_grams"),
            ).where(F.lit(False))
        if len(head) <= bloom_max_grams:
            hashes = head.to_numpy(np.int64)
            bits_log2 = (
                bloom_bits_log2
                if bloom_bits_log2 is not None
                else _bloom_bits_log2_for(len(hashes))
            )
            sc = docs.sparkSession.sparkContext
            bench_bc = sc.broadcast(np.sort(hashes))
            bits_bc = sc.broadcast(_bloom_bits(hashes, bits_log2, bloom_k))
            counter = hit_count_udf(bench_bc, n, bits_bc, bits_log2, bloom_k)
            return corpus.select(
                F.col(id_col),
                counter(token_hashes_col(text_col)).alias("n_hit_grams"),
            ).where(F.col("n_hit_grams") > 0)
    exploded = corpus.select(
        F.col(id_col),
        F.explode(gram_sets_udf(n)(token_hashes_col(text_col))).alias("g"),
    )
    return (
        exploded.join(F.broadcast(bench), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_hit_grams"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """The keep-side: documents with ZERO benchmark n-gram overlap.
    Anti-join against the hit report — docs flow through unmodified
    (all columns preserved)."""
    hits = contamination_hits(docs, benchmark, n, id_col, text_col, **kw)
    return docs.join(hits.select(id_col), id_col, "left_anti")
