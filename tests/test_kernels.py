"""Golden kernel tests.

Values ported verbatim from the reference fixtures:
- /root/reference/tests/test_data/distance_tests.json (JW, Levenshtein,
  Default bands with explicit deltas)
- /root/reference/tests/ocr_multichar_test.go:14-55 (OCR edit counts;
  where the Go comments over-claim, the traced engine behavior is used —
  the Go tests only assert "found within budget")
"""

import pytest

from fuzzy_matcher_spark.functions.similarity import (
    jaro_winkler,
    levenshtein_sim,
    similarity,
    trie_edit_distance,
)

JW_CASES = [
    ("john", "john", 1.0, 0.001),
    ("john", "xyz", 0.0, 0.1),
    ("john", "jon", 0.85, 0.15),
    ("smith", "smyth", 0.8, 0.2),
    ("", "", 0.0, 0.001),
    ("john", "", 0.0, 0.001),
]

LEV_CASES = [
    ("hello", "hello", 1.0, 0.001),
    ("hello", "hallo", 0.8, 0.15),
    ("", "", 1.0, 0.001),
]

DEFAULT_CASES = [
    ("20250815", "20250815"),
    ("20250815", "20250816"),
    ("", ""),
    ("20250815", ""),
]


@pytest.mark.parametrize("s1,s2,expected,delta", JW_CASES)
def test_jaro_winkler_golden(s1, s2, expected, delta):
    assert abs(jaro_winkler(s1, s2) - expected) <= delta


@pytest.mark.parametrize("s1,s2,expected,delta", LEV_CASES)
def test_levenshtein_golden(s1, s2, expected, delta):
    assert abs(levenshtein_sim(s1, s2) - expected) <= delta


@pytest.mark.parametrize("s1,s2", DEFAULT_CASES)
def test_default_golden(s1, s2):
    assert similarity(s1, s2, "default") == 1.0


def test_jw_threshold_behavior():
    """Threshold-critical values the golden query bands depend on."""
    # surname min_distance 0.9: smythe must fail, jhonson must pass
    assert jaro_winkler("smythe", "smith") < 0.9
    assert jaro_winkler("jhonson", "johnson") >= 0.9
    # firstname min_distance 0.7: nicknames must pass, bob->robert fail
    for q, s in [("ben", "benjamin"), ("mike", "michael"), ("bill", "william"),
                 ("alex", "alexander"), ("chris", "christopher"),
                 ("matt", "matthew"), ("dan", "daniel")]:
        assert jaro_winkler(q, s) >= 0.7, (q, s)
    assert jaro_winkler("bob", "robert") < 0.7


# OCR edit accounting (ocr_multichar_test.go scenarios)
OCR_CASES = [
    ("srnith", "smith", True, 1),
    ("srnith", "smith", False, 2),
    ("srnithsrnith", "smithsmith", True, 2),
    ("srnithsrnithsrnithsrnithsrnith", "smithsmithsmithsmithsmith", True, 5),
    ("srnithsrnithsrnithsrnithsrnith", "smithsmithsmithsmithsmith", False, 10),
    ("jonnson", "jomson", True, 1),
    ("clown", "down", True, 1),
    ("dovvn", "down", True, 2),  # reference reaches it via sub+skip, traced
    ("jonnath4n", "jonathan", True, 2),
]


@pytest.mark.parametrize("q,s,ocr,expected", OCR_CASES)
def test_trie_edit_distance(q, s, ocr, expected):
    assert trie_edit_distance(q, s, ocr) == expected


def test_trie_edit_free_suffixes():
    # completion (BFS beyond query end) is free: recurse.go:69-71
    assert trie_edit_distance("ben", "benjamin") == 0
    # emission at end-of-string with query remainder: smythe -> smith = 1
    assert trie_edit_distance("smythe", "smith") == 1
    assert trie_edit_distance("", "anything") == 0
    assert trie_edit_distance("abc", "") == 3


def test_kernels_on_spark(spark):
    """The pandas-UDF wrappers agree with the pure-Python kernels."""
    from pyspark.sql import functions as F
    from fuzzy_matcher_spark.functions.similarity import (
        jaro_winkler_udf, levenshtein_sim_udf, trie_edits_udf)

    rows = [(s1, s2) for s1, s2, _, _ in JW_CASES]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(
        "a", "b",
        jaro_winkler_udf("a", "b").alias("jw"),
        levenshtein_sim_udf("a", "b").alias("lev"),
        trie_edits_udf(False)("a", "b").alias("edits"),
    ).collect()
    for r in got:
        assert abs(r.jw - jaro_winkler(r.a, r.b)) < 1e-12
        assert abs(r.lev - levenshtein_sim(r.a, r.b)) < 1e-12
        assert r.edits == trie_edit_distance(r.a, r.b)


def test_jaro_winkler_duckdb_bitwise_parity():
    """jaro_winkler_duckdb must be bitwise-identical to DuckDB's
    jaro_winkler_similarity — it exists solely so the matcher_jw_search
    driver query can hash-check the JW fuzzy plan corpus-wide."""
    import random

    import duckdb

    from fuzzy_matcher_spark.functions.similarity import jaro_winkler_duckdb

    con = duckdb.connect()
    rng = random.Random(17)
    cases = [("", ""), ("", "a"), ("abc", "abc"), ("john", "jon"),
             ("customer000000003", "customer000000915")]
    for alpha in ("abcdefg0123", "ab", "abcdefghijklmnop0123456789"):
        for _ in range(1500):
            a = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 14)))
            b = "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 14)))
            cases.append((a, b))
    for a, b in cases:
        want = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler_duckdb(a, b) == want, (a, b)
