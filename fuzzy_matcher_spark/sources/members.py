"""Reference test fixtures as DataFrames (FIXTURES.md F1/F2/F5/F6).

Data ported from /root/reference/tests/test_data/*.json (golden
fixtures, re-encoded as Python structures): the 20-member roster
(example_members.json), the 2-member basic/removal rosters
(basic_tests.json, remove_entries_test_data.json), and the extraction
rules of fuzzy_classes/example_source.go:104-120 (lower+trim names,
yyyyMMdd birthdate, expiry = event_end + 12h).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_matcher_spark.config import MatchConfig
from fuzzy_matcher_spark.functions.normalize import is_valid_name_col
from fuzzy_matcher_spark.operators.matcher import prepare

# (id, firstname, surname, birthdate) — example_members.json
MEMBERS = [
    (1, "John", "Smith", "1990-05-15"),
    (2, "Sarah", "Johnson", "1985-12-03"),
    (3, "Michael", "Brown", "1992-08-22"),
    (4, "Emma", "Davis", "1988-03-10"),
    (5, "James", "Wilson", "1995-01-18"),
    (6, "Olivia", "Miller", "1993-07-25"),
    (7, "William", "Moore", "1987-11-08"),
    (8, "Sophia", "Taylor", "1991-04-12"),
    (9, "Benjamin", "Anderson", "1989-09-14"),
    (10, "Isabella", "Thomas", "1994-06-30"),
    (11, "Alexander", "Jackson", "1986-02-28"),
    (12, "Mia", "White", "1996-10-05"),
    (13, "Ethan", "Harris", "1990-12-20"),
    (14, "Charlotte", "Martin", "1992-01-11"),
    (15, "Daniel", "Garcia", "1988-08-07"),
    (16, "Amelia", "Rodriguez", "1993-03-16"),
    (17, "Matthew", "Lewis", "1995-05-23"),
    (18, "Harper", "Lee", "1991-07-19"),
    (19, "Christopher", "Walker", "1987-04-02"),
    (20, "Evelyn", "Hall", "1994-11-13"),
]

# basic_tests.json / remove_entries_test_data.json two-member rosters
BASIC_MEMBERS = [
    (1, "John", "Smith", "1990-05-15"),
    (2, "Jane", "Doe", "1985-12-03"),
]
REMOVAL_MEMBERS = [
    (1, "John", "Smith", "1990-05-15"),
    (2, "John", "Williams", "1985-12-03"),
]


def _to_df(spark: SparkSession, rows) -> DataFrame:
    return spark.createDataFrame(
        rows, "id long, firstname string, surname string, birthdate string"
    )


def extraction_exprs() -> dict:
    """CreateFuzzyEntry analog (example_source.go:104-120): names are
    lower+trim (normalize_col further strips non-alnum), birthdate
    matched as its yyyyMMdd digits."""
    return {
        "firstname": F.lower(F.trim("firstname")),
        "surname": F.lower(F.trim("surname")),
        "birthdate": F.date_format(F.to_date("birthdate"), "yyyyMMdd"),
    }


def members_df(spark: SparkSession, cfg: MatchConfig, rows=None) -> DataFrame:
    return prepare(
        _to_df(spark, MEMBERS if rows is None else rows), cfg, extraction_exprs()
    )


def probes_df(spark: SparkSession, probes, cfg: MatchConfig | None = None) -> DataFrame:
    """probes: list of (probe_id, firstname, surname, birthdate)."""
    from fuzzy_matcher_spark.config import example_member_config

    df = spark.createDataFrame(
        probes,
        "probe_id long, firstname string, surname string, birthdate string",
    )
    return prepare(df, cfg or example_member_config(), extraction_exprs())


def probe_validity_col():
    """ValidateEntry over the probe (example_source.go:84-101)."""
    return is_valid_name_col("firstname", "surname")
