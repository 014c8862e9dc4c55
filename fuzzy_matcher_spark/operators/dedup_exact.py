"""Exact deduplication — hash groupBy, no Python anywhere.

Spark-first shape: cluster id = min(doc id) per identical text. The
grouping key is xxhash64(text) (cheap, fixed-width shuffle key); hash
collisions are guarded by also grouping on length + md5. For pair
emission (feeding connected components) we emit *star* pairs per
group — (min_id, id) via a window min — which preserves connectivity
with O(n) rows per family instead of O(n^2) and keeps the dup graph
diameter 2, so CC converges in O(1) rounds; a mega-family of identical
boilerplate pages costs linear shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_key(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        "_ek",
        F.struct(
            F.xxhash64(text_col).alias("h"),
            F.length(text_col).alias("ln"),
            F.md5(F.col(text_col).cast("binary")).alias("m"),
        ),
    )


def star_pairs_from_keys(keyed: DataFrame, id_col: str) -> DataFrame:
    """(a, b) star pairs over a pre-keyed (id, _ek) relation — the
    shared core of exact_pairs, also fed from the dedup pipeline's
    cached signature relation so raw text isn't re-scanned."""
    hub = F.min(id_col).over(Window.partitionBy("_ek"))
    return (
        keyed.withColumn("_hub", hub)
        .where(F.col(id_col) != F.col("_hub"))
        .select(F.col("_hub").alias("a"), F.col(id_col).alias("b"))
    )


def exact_clusters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, cluster_id) where cluster_id = min id among byte-identical
    texts. Two shuffles: partial-agg groupBy + join back."""
    keyed = exact_key(df, text_col).select(id_col, "_ek")
    mins = keyed.groupBy("_ek").agg(F.min(id_col).alias("cluster_id"))
    return keyed.join(mins, "_ek").select(id_col, "cluster_id")


def exact_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Star pairs (min_id, id) linking byte-identical docs — O(n) per
    family and diameter 2 (CC converges in O(1) rounds)."""
    return star_pairs_from_keys(
        exact_key(df, text_col).select(id_col, "_ek"), id_col
    )
