"""Sessionization + event analytics over the events table.

Batch sessionization = window lag + gap cumsum (the standard Spark
idiom); the streaming counterpart lives in fornax_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Assign session ids per user: a new session starts when the gap
    from the previous event exceeds gap_minutes.

    Returns (user_id, session_id, n_events, start_ts, end_ts). One
    shuffle on user_id; skew-safe for normal user distributions (a
    pathological single hot user would need salting + two-phase).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # microsecond precision, no truncation; cast handles TIMESTAMP_NTZ
    # sources (session TZ is pinned UTC so the cast is identity-safe)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    with_break = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    df = events.withColumn("is_new", with_break).withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return df.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
    )
