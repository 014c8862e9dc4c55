"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark, the matching
``oracle_sql()`` on DuckDB (tables registered as views over the same
parquet), and compares row count, sorted column names, and
order-insensitive values — exact for ints/strings, exact for doubles
too (the driver value-hashes; our float discipline must hold bitwise).
"""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    return pdf


ORACLES = entry_mod.oracle_sql()
ALL_QUERIES = entry_mod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, duck, name):
    q = ALL_QUERIES[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    exp = _canon(duck.execute(ORACLES[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for col in got.columns:
        g, e = got[col], exp[col]
        if g.dtype.kind == "f" or e.dtype.kind == "f":
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(g, e))
                if not (a == b or (math.isnan(a) and math.isnan(b)))
            ]
            assert not bad, f"{name}.{col}: first diffs {bad[:3]}"
        else:
            diff = g.astype(str).ne(e.astype(str))
            assert not diff.any(), (
                f"{name}.{col}: {int(diff.sum())} diffs, first at row "
                f"{diff.idxmax()}: {g[diff.idxmax()]!r} vs {e[diff.idxmax()]!r}"
            )


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.schema is not None


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "cluster_id"}
