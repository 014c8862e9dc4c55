"""Shingling — pure JVM expressions (higher-order functions + xxhash64).

The reference has no document shingling (its index keys are whole
normalized field values, fuzzy_matcher_core.go:76-80); this is the
north-rule generalization to document scale (Broder 1997). Everything
here compiles to Catalyst expressions: tokenization, n-gram windows,
distinct, and 64-bit hashing all run inside whole-stage codegen /
expression eval — no Python in the scan path. The downstream MinHash
permutation step (functions/minhash.py) is the only pandas UDF.

Normalization mirrors the reference's (lower + non-alphanumeric strip,
normalize.go:9-15) but keeps token boundaries: runs of non-alphanumerics
become separators. Applied only to derived columns (input_hint
invariant: ``text`` itself is never rewritten).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tokens_col(text: Column | str) -> Column:
    """lower + split on non-alphanumeric runs, drop empties."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(c), "[^a-z0-9]+")
    return F.filter(toks, lambda x: F.length(x) > 0)


def word_shingles_from_tokens(toks: Column, n: int) -> Column:
    """Distinct word n-grams (space-joined) over a token-array column.
    Docs shorter than n tokens contribute their whole token string as a
    single shingle."""
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), sz - F.lit(n)),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    short = F.array(F.array_join(toks, " "))
    return F.array_distinct(F.when(sz >= n, grams).otherwise(short))


def char_shingles_from_norm(norm: Column, n: int) -> Column:
    """Distinct character n-grams over a normalized-string column."""
    ln = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), ln - F.lit(n - 1)),
        lambda i: F.substring(norm, i, F.lit(n)),
    )
    return F.array_distinct(F.when(ln >= n, grams).otherwise(F.array(norm)))


def shingle_base_col(text: Column | str, mode: str) -> Column:
    """The per-mode base the gram window slides over (token array /
    normalized string). Materialize this in its OWN projection before
    building grams — see add_shingles."""
    c = F.col(text) if isinstance(text, str) else text
    if mode == "word":
        return tokens_col(c)
    if mode == "char":
        return F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")
    raise ValueError(f"unknown shingle mode: {mode}")


def shingles_from_base(base: Column, mode: str, n: int) -> Column:
    if mode == "word":
        return word_shingles_from_tokens(base, n)
    return char_shingles_from_norm(base, n)


def word_shingles_col(text: Column | str, n: int) -> Column:
    """Single-expression form — ONLY for small inputs/oracle queries:
    the tokenizer is inlined into the gram lambda and re-evaluated per
    gram (higher-order-function lambdas get no common-subexpression
    elimination; measured ~20x slower than add_shingles on 150-word
    docs). Pipelines use add_shingles / add_shingle_hashes."""
    return word_shingles_from_tokens(tokens_col(text), n)


def char_shingles_col(text: Column | str, n: int) -> Column:
    """Single-expression form — see word_shingles_col caveat."""
    return char_shingles_from_norm(shingle_base_col(text, "char"), n)


def shingle_hashes_col(shingles: Column) -> Column:
    """xxhash64 of each shingle — JVM-side, feeds MinHash/SimHash."""
    return F.transform(shingles, lambda x: F.xxhash64(x))


def token_hashes_col(text: Column | str) -> Column:
    """xxhash64 per TOKEN (not per gram): the cheap JVM first half of
    the word-shingle fast path — no gram strings are ever allocated
    (the gram-string path churns ~150 short-lived strings per doc and
    is memory-bandwidth-bound; measured 2x on the signature stage at
    300k docs/local[32]). Gram ids are then formed numerically inside
    the MinHash pandas UDFs (functions/minhash.py _mix_grams) — a
    pure-Catalyst variant (xxhash64 over slices in transform()) was
    measured far slower: higher-order-function lambdas evaluate
    interpreted, allocating a slice array per gram."""
    return F.transform(tokens_col(text), lambda x: F.xxhash64(x))


def shingles_col(text: Column | str, mode: str, n: int) -> Column:
    if mode == "word":
        return word_shingles_col(text, n)
    if mode == "char":
        return char_shingles_col(text, n)
    raise ValueError(f"unknown shingle mode: {mode}")


def add_shingles(
    df: DataFrame, mode: str, n: int, text_col: str = "text", out: str = "_sh"
) -> DataFrame:
    """Two-projection shingling: the token array (or normalized string)
    is materialized as a real column first, so the gram lambda binds a
    column reference instead of inlining the tokenizer expression.
    CollapseProject leaves the split intact because the base column is
    referenced multiple times by a non-cheap expression. Measured 20x
    faster than the single-expression form at 150 words/doc."""
    base = df.withColumn("_shbase", shingle_base_col(text_col, mode))
    return base.withColumn(out, shingles_from_base(F.col("_shbase"), mode, n)).drop(
        "_shbase"
    )


def add_shingle_hashes(
    df: DataFrame,
    mode: str,
    n: int,
    text_col: str = "text",
    out: str = "shingle_hashes",
) -> DataFrame:
    """add_shingles + xxhash64 per shingle, shingle strings dropped."""
    with_sh = add_shingles(df, mode, n, text_col, out="_shs")
    return with_sh.withColumn(out, shingle_hashes_col(F.col("_shs"))).drop("_shs")
