"""Hand-computed checks for the Gopher-style repetition metrics
(functions/textstats.py) — the webtext quality-filtering signals.

The sorted-run formulation of top-token count must equal the max
token frequency, and dup_gram_frac must count repeated n-gram
POSITIONS (1 - distinct/total), matching the DuckDB oracle twin in
__spark_entry__.py.
"""

import pytest
from pyspark.sql import functions as F

from fuzzy_matcher_spark.functions.shingles import tokens_col
from fuzzy_matcher_spark.functions.textstats import repetition_stats_cols

CASES = [
    # text, n_tokens, distinct_ratio, top_token_frac, dup_gram_frac
    ("a a a b", 4, 2 / 4, 3 / 4, 0.0),  # grams "a a a","a a b" distinct
    ("a a a a", 4, 1 / 4, 1.0, 1.0 - 1 / 2),  # "a a a" twice
    ("w x y z w x y z", 8, 4 / 8, 2 / 8, 1.0 - 4 / 6),
    ("one two", 2, 1.0, 1 / 2, 0.0),  # shorter than gram window
    ("", 0, 0.0, 0.0, 0.0),
    ("!!! ...", 0, 0.0, 0.0, 0.0),  # normalizes to zero tokens
    ("Tick, tock! TICK? tock.", 4, 2 / 4, 2 / 4, 0.0),
]


@pytest.fixture(scope="module")
def stats_rows(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_rest) in enumerate(CASES)], ["doc_id", "text"]
    ).withColumn("_toks", tokens_col("text"))
    cols = repetition_stats_cols(F.col("_toks"))
    out = df.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    ).collect()
    return {r["doc_id"]: r for r in sorted(out, key=lambda r: r["doc_id"])}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_repetition_case(stats_rows, i):
    _text, n, dr, tf, dg = CASES[i]
    r = stats_rows[i]
    assert r["n_tokens"] == n
    assert r["distinct_ratio"] == pytest.approx(dr, abs=0)
    assert r["top_token_frac"] == pytest.approx(tf, abs=0)
    assert r["dup_gram_frac"] == pytest.approx(dg, abs=1e-15)
