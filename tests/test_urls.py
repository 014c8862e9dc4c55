"""Edge-case checks for URL canonicalization (functions/urls.py).

The contract query's oracle (an independent DuckDB implementation)
covers the synthesized-variant grid; these pin hand-picked adversarial
cases through the package boundary.
"""

import pytest
from pyspark.sql import functions as F

from fuzzy_matcher_spark.functions.urls import (
    canonical_query_col,
    host_col,
    url_normalize_col,
)

CASES = [
    # raw, expected canonical
    ("HTTPS://WWW.Foo.COM:443/A/b?b=2&a=1#x", "https://www.foo.com/A/b?a=1&b=2"),
    ("http://foo.com:80/", "http://foo.com/"),
    ("http://foo.com:8080/", "http://foo.com:8080/"),
    ("https://foo.com", "https://foo.com/"),
    ("https://foo.com?utm_source=a&utm_medium=b&gclid=1&fbclid=2&ref=r",
     "https://foo.com/"),
    ("https://foo.com/p?refresh=1", "https://foo.com/p?refresh=1"),  # not 'ref'
    ("https://foo.com/p?&&a=1", "https://foo.com/p?a=1"),  # empty params
    ("  https://foo.com/p  ", "https://foo.com/p"),  # trim
    ("ftp://Files.Example.com/pub", "ftp://files.example.com/pub"),
    ("no-scheme.Example.com/Path", "no-scheme.example.com/path"),  # passthrough
    ("https://foo.com/p?a=1#frag?b=2", "https://foo.com/p?a=1"),  # ? after #
    # '?' ONLY inside the fragment (SPA route): no query at all — the
    # fragment content must not leak into the canonical key
    ("https://App.com/#/route?tab=1", "https://app.com/"),
    ("https://app.com#frag?x=1", "https://app.com/"),
]


@pytest.fixture(scope="module")
def norm_rows(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], ["i", "url"]
    )
    out = df.select(
        "i",
        url_normalize_col("url").alias("norm"),
        host_col("url", strip_www=True).alias("host_nw"),
        canonical_query_col("url").alias("cq"),
    ).collect()
    return {r["i"]: r for r in out}


@pytest.mark.parametrize("i", range(len(CASES)))
def test_url_normalize_case(norm_rows, i):
    raw, want = CASES[i]
    assert norm_rows[i]["norm"] == want, raw


def test_strip_www(norm_rows):
    assert norm_rows[0]["host_nw"] == "foo.com"
