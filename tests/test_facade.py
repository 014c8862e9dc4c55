"""FuzzyMatcher facade: O13 API parity + expiry (O11) + persistence."""

import pytest
from pyspark.sql import functions as F

from fuzzy_matcher_spark.config import (
    CoreParams,
    MatchConfig,
    example_member_config,
)
from fuzzy_matcher_spark.matcher_api import FuzzyMatcher
from fuzzy_matcher_spark.sources.members import (
    MEMBERS,
    extraction_exprs,
    probe_validity_col,
)
from fuzzy_matcher_spark.sources.tableio import ParquetTableIO

CFG = example_member_config()


def _members_raw(spark, rows=None):
    return spark.createDataFrame(
        rows or MEMBERS,
        "id long, firstname string, surname string, birthdate string",
    )


def _probe(spark, fn, sn, bd):
    return spark.createDataFrame(
        [(0, fn, sn, bd)],
        "probe_id long, firstname string, surname string, birthdate string",
    )


def test_facade_lifecycle(spark):
    m = FuzzyMatcher(CFG, spark)
    # empty search before any insert
    assert m.search(_probe(spark, "John", "Smith", "1990-05-15"),
                    extraction=extraction_exprs()).count() == 0
    # insert is a no-op on empty input
    m.insert_entries(_members_raw(spark).where("id < 0"),
                     extraction=extraction_exprs())
    assert m._base is None

    m.insert_entries(_members_raw(spark), extraction=extraction_exprs())
    hits = m.search(
        _probe(spark, "Jon", "Smith", "1990-05-15"),
        extraction=extraction_exprs(),
        is_valid_col=probe_validity_col(),
    ).collect()
    assert any(r.id == 1 for r in hits)

    # incremental insert visibility
    m.insert_entries(
        _members_raw(spark, [(99, "Zelda", "Quixote", "1999-09-09")]),
        extraction=extraction_exprs(),
    )
    hits = m.search(_probe(spark, "Zelda", "Quixote", "1999-09-09"),
                    extraction=extraction_exprs()).collect()
    assert any(r.id == 99 for r in hits)

    # delete
    m.remove_entries(spark.createDataFrame([(1,)], "id long"))
    hits = m.search(_probe(spark, "John", "Smith", "1990-05-15"),
                    extraction=extraction_exprs()).collect()
    assert not any(r.id == 1 for r in hits)


def test_facade_expiry(spark):
    cfg = MatchConfig(fields=CFG.fields, core=CoreParams(max_edits=6,
                                                         use_expiration=True))
    m = FuzzyMatcher(cfg, spark)
    with pytest.raises(ValueError, match="expiry"):
        m.insert_entries(_members_raw(spark), extraction=extraction_exprs())

    # expiry = event_end + 12h (example_source.go:118); one expired row
    base = _members_raw(spark).withColumn(
        "expiry",
        F.when(F.col("id") == 1, F.lit("2000-01-01 00:00:00"))
        .otherwise(F.lit("2999-08-21 11:00:00"))
        .cast("timestamp"),
    )
    m.insert_entries(base, extraction=extraction_exprs())
    as_of = F.lit("2025-01-01 00:00:00").cast("timestamp")
    hits = m.search(_probe(spark, "John", "Smith", "1990-05-15"),
                    extraction=extraction_exprs(), as_of=as_of).collect()
    assert not any(r.id == 1 for r in hits)  # expired entry invisible
    hits = m.search(_probe(spark, "Sarah", "Johnson", "1985-12-03"),
                    extraction=extraction_exprs(), as_of=as_of).collect()
    assert any(r.id == 2 for r in hits)

    m.clean_expired(as_of=as_of)
    assert m._base.where("id = 1").count() == 0


def test_facade_tableio_persistence(spark, tmp_path):
    io = ParquetTableIO(spark, str(tmp_path / "wh"))
    m = FuzzyMatcher(CFG, spark, io=io)
    m.insert_entries(_members_raw(spark), extraction=extraction_exprs())
    m.remove_entries(spark.createDataFrame([(1,), (2,)], "id long"))

    # a new matcher instance recovers state from storage
    m2 = FuzzyMatcher(CFG, spark, io=io)
    assert m2._base is not None
    ids = {r.id for r in m2._base.select("id").collect()}
    assert 1 not in ids and 2 not in ids and 3 in ids
    hits = m2.search(_probe(spark, "Michael", "Brown", "1992-08-22"),
                     extraction=extraction_exprs()).collect()
    assert any(r.id == 3 for r in hits)


def test_incremental_insert_lineage_bounded(spark):
    """r3 ask 4 / r4 VERDICT #2: a long-lived matcher receiving many
    incremental inserts must not build an unbounded Union tower —
    insert_entries truncates lineage every CHECKPOINT_EVERY inserts.
    Reference contract: re-entrant Build (fuzzy_matcher_core.go:59-106,
    tests/integration_test.go:656-675)."""
    from fuzzy_matcher_spark import matcher_api

    m = FuzzyMatcher(CFG, spark)
    rows = [
        (i, f"first{i:03d}", f"sur{i:03d}", "1990-01-01") for i in range(200)
    ]
    for r in rows:
        m.insert_entries(_members_raw(spark, [r]), extraction=extraction_exprs())

    plan = m._base._jdf.queryExecution().analyzed().toString()
    # without checkpointing the analyzed plan holds 199 Unions; with it
    # at most one checkpoint window's worth survives
    assert plan.count("Union") <= matcher_api.CHECKPOINT_EVERY
    hits = m.search(
        _probe(spark, "first007", "sur007", "1990-01-01"),
        extraction=extraction_exprs(),
    ).collect()
    assert any(r.id == 7 for r in hits)
    # rows from before AND after the last checkpoint are all searchable
    hits = m.search(
        _probe(spark, "first199", "sur199", "1990-01-01"),
        extraction=extraction_exprs(),
    ).collect()
    assert any(r.id == 199 for r in hits)
