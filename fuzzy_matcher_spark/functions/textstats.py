"""Text-analysis columns for training-data pipelines — pure JVM exprs.

Every function here compiles to built-in Catalyst expressions (no
Python), and each has an exact ANSI-SQL twin runnable by DuckDB — the
driver's oracle — so they are all first-class `queries()` entries.

- token counting: whitespace/non-alnum tokens and a BPE-ish regex
- language ID: stopword-intersection heuristic over a fixed 4-language
  marker table, deterministic tie-break
- quality scoring: alpha ratio, stopword ratio, length saturation
- document fingerprinting: md5 over the reference normalization
  (normalize.go:9-15 applied as a derived column)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fuzzy_matcher_spark.functions.normalize import normalize_col
from fuzzy_matcher_spark.functions.shingles import tokens_col

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

# language marker stopwords (fixed, tiny; heuristic n-gram-free lang id)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "la", "que", "los", "una"],
    "fr": ["le", "les", "des", "est", "dans"],
}
LANG_ORDER = ["en", "de", "es", "fr"]  # deterministic tie-break order


def token_count_col(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def bpe_token_count_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_REGEX), 0))


def lang_scores_cols(text: Column | str) -> dict[str, Column]:
    toks = F.array_distinct(tokens_col(text))
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id_col(text: Column | str) -> Column:
    """argmax over marker hits; earlier LANG_ORDER wins ties; 'und'
    (undetermined) when no marker hits at all."""
    scores = lang_scores_cols(text)
    best = scores[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        best = F.greatest(best, scores[lang])
    out = F.lit("und")
    for lang in reversed(LANG_ORDER):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), lang).otherwise(out)
    return out


def alpha_ratio_col(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    ln = F.length(c)
    alpha = F.length(F.regexp_replace(c, "[^a-zA-Z]", ""))
    return F.when(ln > 0, alpha / ln).otherwise(F.lit(0.0))


def stopword_ratio_col(text: Column | str) -> Column:
    toks = tokens_col(text)
    stops = F.array(*[F.lit(w) for ws in LANG_MARKERS.values() for w in ws])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score_col(text: Column | str) -> Column:
    """Composite in [0,1]: alpha ratio + stopword signal + length
    saturation (tokens/100 capped at 1)."""
    tc = token_count_col(text)
    sat = F.least(tc / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.5) * alpha_ratio_col(text)
        + F.lit(0.3) * stopword_ratio_col(text)
        + F.lit(0.2) * sat
    )


def fingerprint_col(text: Column | str) -> Column:
    """md5 hex of the normalized text (stable content fingerprint)."""
    return F.md5(normalize_col(text).cast("binary"))


def max_token_run_col(toks: Column) -> Column:
    """Count of the most frequent token, computed as the longest equal
    run of the SORTED token array — a single O(n log n) narrow
    expression (no explode/shuffle; repetition is a per-row property,
    so a corpus-wide token shuffle would be pure waste at scale)."""
    sorted_toks = F.array_sort(toks)
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc: Column, x: Column) -> Column:
        cur2 = F.when(x == acc["prev"], acc["cur"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        return F.struct(
            x.alias("prev"),
            cur2.alias("cur"),
            F.greatest(acc["best"], cur2).alias("best"),
        )

    return F.aggregate(sorted_toks, acc0, merge, lambda acc: acc["best"])


def dup_gram_frac_col(toks: Column, n: int = 3) -> Column:
    """Fraction of word n-gram positions occupied by a repeated n-gram
    (Gopher / RefinedWeb-style repetition signal): 1 - distinct/total
    over the sliding n-gram window; 0.0 for docs shorter than n
    tokens. Same gram expression as shingles.word_shingles_from_tokens
    so the DuckDB oracle can mirror it exactly."""
    sz = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), sz - F.lit(n)),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    total = (sz - F.lit(n - 1)).cast("double")
    return F.when(
        sz >= n,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))


def repetition_stats_cols(toks: Column, gram_n: int = 3) -> dict[str, Column]:
    """Per-doc repetition metrics over a materialized token-array
    column (two-projection pattern — pass a real column, not the
    inlined tokenizer; see shingles.add_shingles)."""
    sz = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    zero = F.lit(0.0)
    return {
        # NULL text -> NULL token array; report 0 tokens so the
        # quality filter classifies it as 'short' instead of NULL-
        # propagating through every threshold
        "n_tokens": F.coalesce(sz.cast("long"), F.lit(0).cast("long")),
        "distinct_ratio": F.when(sz > 0, nd.cast("double") / sz).otherwise(zero),
        "top_token_frac": F.when(
            sz > 0, max_token_run_col(toks).cast("double") / sz
        ).otherwise(zero),
        "dup_gram_frac": dup_gram_frac_col(toks, gram_n),
    }
