"""Partitioned TableIO writes + non-broadcast matcher path."""

import os

from pyspark.sql import functions as F

from fuzzy_matcher_spark.config import example_member_config
from fuzzy_matcher_spark.operators.matcher import search
from fuzzy_matcher_spark.sources.members import (
    members_df,
    probe_validity_col,
    probes_df,
)
from fuzzy_matcher_spark.sources.tableio import ParquetTableIO
from fuzzy_matcher_spark.sources.webpages import webpages_df


def test_tableio_partitioned_write_prunes(spark, tmp_path):
    io = ParquetTableIO(spark, str(tmp_path / "wh"))
    pages = webpages_df(spark, n_families=5, singletons=5, seed=4)
    io.write(pages, "pages", partition_by=["lang"])

    snap = io.snapshots("pages")[0]["path"]
    assert any(d.startswith("lang=") for d in os.listdir(snap))

    got = io.read("pages").where(F.col("lang") == "en")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan or "lang#" in plan
    assert got.count() == pages.where("lang = 'en'").count()


def test_search_without_probe_broadcast_matches(spark):
    cfg = example_member_config()
    base = members_df(spark, cfg)
    probes = probes_df(
        spark,
        [(0, "Jon", "Smith", "1990-05-15"), (1, "Mike", "Brown", "1992-08-22")],
    )
    a = search(base, probes, cfg, is_valid_col=probe_validity_col())
    b = search(
        base, probes, cfg, is_valid_col=probe_validity_col(),
        broadcast_probes=False,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_null_text_dedup(spark):
    """NULL texts co-cluster as identical-missing; distinct from ''."""
    from fuzzy_matcher_spark.config import DedupConfig
    from fuzzy_matcher_spark.operators.dedup_minhash import minhash_dedup

    df = spark.createDataFrame(
        [(0, None), (1, "some real text here"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.cluster_id
           for r in minhash_dedup(df, DedupConfig(shingle_size=3)).collect()}
    assert got[0] == got[2]
    assert len({got[0], got[1], got[3]}) == 3


def test_null_field_matcher(spark):
    """NULL probe/base fields behave as empty strings (Go semantics):
    required empty field matches only empty; otherwise rejected."""
    from fuzzy_matcher_spark.config import example_member_config
    from fuzzy_matcher_spark.operators.matcher import prepare, search

    cfg = example_member_config()
    base = prepare(spark.createDataFrame(
        [(1, "John", None, "19900515"), (2, "John", "Smith", "19900515")],
        "id long, firstname string, surname string, birthdate string"), cfg)
    probes = prepare(spark.createDataFrame(
        [(0, "John", None, "19900515")],
        "probe_id long, firstname string, surname string, birthdate string"), cfg)
    got = search(base, probes, cfg).collect()
    ids = {r.id for r in got}
    # surname is required (min 0.9): JW("","") = 0 < 0.9 rejects the
    # null-surname member; Smith fails against the empty probe too
    assert ids == set(), got


def test_non_broadcast_blocking_keys_are_two_chars(spark):
    """r4 VERDICT #3: off the broadcast path the completion/mirror
    joins must not hash-partition the base relation on a 1-char
    (<=36-value) key — the exchanges key on (<=2)-char prefixes."""
    cfg = example_member_config()
    base = members_df(spark, cfg)
    probes = probes_df(spark, [(0, "Jon", "Smith", "1990-05-15")])
    out = search(
        base, probes, cfg, is_valid_col=probe_validity_col(),
        broadcast_probes=False,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the 2-char prefix keys appear in the exchanges; a lone
    # substring(_bn, 1, 1) partitioning key would be the skew magnet
    assert "substring(_bn" in plan or "substring(_pn" in plan
    import re

    for m in re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
        assert "substring(_bn#" not in m.group(1) or ", 1, 1)" not in m.group(1), (
            "exchange keyed on 1-char base prefix:\n" + m.group(0)
        )
