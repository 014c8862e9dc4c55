"""Exact deduplication — hash groupBy, no Python anywhere.

Spark-first shape: cluster id = min(doc id) per identical text. The
grouping key is xxhash64(text) (cheap, fixed-width shuffle key); hash
collisions are guarded by also grouping on length + md5. For pair
emission (feeding connected components) we emit a *sorted chain* per
group — consecutive (id_i, id_{i+1}) pairs via a window lead — which
preserves connectivity with O(n) rows per family instead of O(n^2);
a mega-family of identical boilerplate pages costs linear shuffle.
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


def exact_clusters(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, cluster_id) where cluster_id = min id among byte-identical
    texts. Two shuffles: partial-agg groupBy + join back."""
    keyed = exact_key(df, text_col).select(id_col, "_ek")
    mins = keyed.groupBy("_ek").agg(F.min(id_col).alias("cluster_id"))
    return keyed.join(mins, "_ek").select(id_col, "cluster_id")


def exact_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Chain pairs (a, b) linking byte-identical docs — O(n) per family."""
    keyed = exact_key(df, text_col).select(id_col, "_ek")
    w = Window.partitionBy("_ek").orderBy(id_col)
    return (
        keyed.withColumn("_nxt", F.lead(id_col).over(w))
        .where(F.col("_nxt").isNotNull())
        .select(F.col(id_col).alias("a"), F.col("_nxt").alias("b"))
    )
