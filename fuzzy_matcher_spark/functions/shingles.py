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

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens_col(text: Column | str) -> Column:
    """lower + split on non-alphanumeric runs, drop empties."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(c), "[^a-z0-9]+")
    return F.filter(toks, lambda x: F.length(x) > 0)


def word_shingles_col(text: Column | str, n: int) -> Column:
    """Distinct word n-grams (space-joined). Docs shorter than n tokens
    contribute their whole token string as a single shingle."""
    toks = tokens_col(text)
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), sz - F.lit(n)),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    short = F.array(F.array_join(toks, " "))
    return F.array_distinct(F.when(sz >= n, grams).otherwise(short))


def char_shingles_col(text: Column | str, n: int) -> Column:
    """Distinct character n-grams over the normalized string."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.lower(c), "[^a-z0-9]+", " ")
    ln = F.length(norm)
    grams = F.transform(
        F.sequence(F.lit(1), ln - F.lit(n - 1)),
        lambda i: F.substring(norm, i, F.lit(n)),
    )
    return F.array_distinct(F.when(ln >= n, grams).otherwise(F.array(norm)))


def shingle_hashes_col(shingles: Column) -> Column:
    """xxhash64 of each shingle — JVM-side, feeds MinHash/SimHash."""
    return F.transform(shingles, lambda x: F.xxhash64(x))


def shingles_col(text: Column | str, mode: str, n: int) -> Column:
    if mode == "word":
        return word_shingles_col(text, n)
    if mode == "char":
        return char_shingles_col(text, n)
    raise ValueError(f"unknown shingle mode: {mode}")
