"""Event sessionization (engine extension — the reference is batch-only
file processing with no event-time semantics, SURVEY §2.11).

Gap-based sessions over the `events` stream table: a new session starts
when a user's inter-event gap exceeds the threshold. Classic window-
function dataflow — one shuffle on user_id, everything else windowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, session_id, n_events, start_epoch, end_epoch, total_value).

    session_id is the per-user running count of gap-exceeding boundaries
    (1-based). Deterministic ordering: (ts, event_id) breaks timestamp
    ties.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp("ts")
    prev = F.lag(epoch).over(w)
    is_new = F.when(prev.isNull() | ((epoch - prev) > gap_seconds), 1).otherwise(0)
    with_session = events.withColumn(
        "session_id", F.sum(is_new).over(w).cast("long")
    )
    return with_session.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min(epoch).cast("long").alias("start_epoch"),
        F.max(epoch).cast("long").alias("end_epoch"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )
