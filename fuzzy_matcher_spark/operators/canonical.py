"""Canonical-document election + kept-set emission.

After clustering, a training-data pipeline keeps one representative
per near-dup cluster. Election is a single max_by/min_by aggregation
(no window over the full corpus): prefer longer text, then earlier
crawl, then smallest id — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def elect_canonical(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
) -> DataFrame:
    """(cluster_id, canonical_id) — one row per cluster."""
    joined = clusters.join(docs, id_col)
    order = F.struct(
        F.length(text_col).alias("len"),
        (-F.unix_timestamp(ts_col)).alias("neg_ts")
        if ts_col
        else F.lit(0).alias("neg_ts"),
        (-F.col(id_col)).alias("neg_id"),
    )
    return joined.groupBy("cluster_id").agg(
        F.max_by(F.col(id_col), order).alias("canonical_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )


def keep_canonical(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str | None = None,
) -> DataFrame:
    """The deduplicated corpus: canonical docs only, full rows."""
    canon = elect_canonical(clusters, docs, id_col, text_col, ts_col)
    return docs.join(
        canon.select(F.col("canonical_id").alias(id_col)), id_col, "left_semi"
    )
