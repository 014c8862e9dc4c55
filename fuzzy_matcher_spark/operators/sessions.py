"""Sessionization — inactivity-gap session assignment (batch form).

Standard lag + cumulative-sum-over-window pattern (the streaming
equivalent is session_window in streaming/ingest.py's domain). Pure
JVM expressions; SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Adds ``session_id`` (1-based per user, ordered by time)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(w))
    new_sess = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """(user_id, n_sessions, n_events)."""
    s = sessionize(events, user_col, ts_col, order_tiebreak, gap_seconds)
    return s.groupBy(user_col).agg(
        F.max("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )
