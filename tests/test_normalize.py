"""Normalization + validation-gate tests.

Golden truth table from
/root/reference/tests/test_data/short_name_validation_tests.json and
/root/reference/tests/example_members_test.go:112-166.
"""

from pyspark.sql import functions as F

from fuzzy_matcher_spark.functions.normalize import (
    normalize_col,
    date_key_col,
    is_valid_name_col,
)

NORM_CASES = [
    ("John", "john"),
    ("  O'Brien-Smith  ", "obriensmith"),
    ("ABC 123!@#", "abc123"),
    ("", ""),
    ("Émile", "mile"),  # reference regex is ASCII-only: [^a-zA-Z0-9]+
]

VALIDATION_CASES = [
    # (first, sur, expect_fuzzy) — short_name_validation_tests.json
    ("Jo", "Li", False),
    ("A", "B", False),
    ("Lee", "Wu", False),
    ("Ann", "Lee", False),
    ("Jane", "Doe", False),  # avg 3.5 is NOT > 3.5
    ("John", "Smith", True),
    ("Alexander", "Johnson", True),
    ("", "Smith", False),
    ("John", "", False),
]


def test_normalize(spark):
    df = spark.createDataFrame([(s,) for s, _ in NORM_CASES], "s string")
    got = [r.n for r in df.select(normalize_col("s").alias("n")).collect()]
    assert got == [e for _, e in NORM_CASES]


def test_date_key(spark):
    df = spark.createDataFrame([("1990-05-15 00:00:00",)], "t string")
    got = df.select(
        date_key_col(F.to_timestamp("t")).alias("k")
    ).collect()[0].k
    assert got == "19900515"


def test_validation_gate(spark):
    df = spark.createDataFrame(
        [(f, s, e) for f, s, e in VALIDATION_CASES],
        "first string, sur string, expect boolean",
    )
    rows = df.select("first", "sur", "expect",
                     is_valid_name_col("first", "sur").alias("got")).collect()
    for r in rows:
        assert r.got == r.expect, (r.first, r.sur)
