"""Event sessionization: gap-based sessions over a user event stream.

Classic behavioral analytics: a session is a maximal run of a user's
events with no gap exceeding ``gap_s``. Pure window expressions —
``lag`` marks session starts, a running sum numbers them, one groupBy
aggregates — all JVM-side, SQL-equivalent (oracle-checked).

Scale note: sessions are inherently sequential per user, so the window
partitions by ``user_id`` — the one per-key ordering no salting trick
can break up (a later chunk's numbering depends on every earlier
event). A single user's events must fit one task; real event data is
bounded per user (clickstreams: ~10^3-10^5 events/user), and the
pathological key (a null/bot user aggregating a large fraction of
traffic) should be filtered or bucketed upstream — that's a data
contract, not an engine choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Events + per-event session index: ``session_idx`` numbers a
    user's sessions 0,1,2,... in time order. Ties on the timestamp
    break by ``order_tiebreak`` so numbering is deterministic."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # NTZ sources cast through the session zone (pinned UTC in
    # session.py) — a naive timestamp cannot cast to double directly
    t = F.col(ts_col).cast("timestamp").cast("double")
    prev = F.lag(t).over(w)
    # two steps: a window function can't nest inside another window's
    # aggregate in one projection
    marked = events.withColumn(
        "_new_session",
        F.when(prev.isNull() | (t - prev > gap_s), 1).otherwise(0))
    run = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak) \
                .rowsBetween(Window.unboundedPreceding, 0)
    return (marked.withColumn(
        "session_idx",
        (F.sum("_new_session").over(run) - 1).cast("long"))
        .drop("_new_session"))


def session_stats(events: DataFrame, gap_s: int = 1800,
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  order_tiebreak: str = "event_id") -> DataFrame:
    """One row per (user, session): event count, wall duration in
    seconds, summed value. The groupBy reuses the window's
    (user) partitioning — AQE sees an already-partitioned child."""
    s = sessionize(events, gap_s, user_col, ts_col, order_tiebreak)
    t = F.col(ts_col).cast("timestamp").cast("double")
    return (s.groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.max(t) - F.min(t), 6).alias("duration_s"),
                 F.round(F.sum(value_col), 2).alias("total_value")))
