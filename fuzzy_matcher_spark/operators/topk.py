"""Top-k helpers.

Per-group top-k = ranking window (the reference's sort-desc + truncate
to 5, fuzzy_matcher_core.go:276-290, re-expressed); global top-k =
orderBy().limit() which Spark executes as TakeOrderedAndProject (no
full sort materialization).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """row_number (deterministic: pass tie-breaking order_cols)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
