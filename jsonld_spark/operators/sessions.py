"""Event sessionization: gap-based sessions over a user event stream.

Classic behavioral analytics: a session is a maximal run of a user's
events with no gap exceeding ``gap_s``. Pure window expressions —
``lag`` marks session starts, a running sum numbers them, one groupBy
aggregates — all JVM-side, SQL-equivalent (oracle-checked).

Scale note: ``sessionize`` partitions its window by ``user_id``, so a
single user's whole history must fit one task — fine for real
clickstreams (~10^3-10^5 events/user), fatal for the null/bot hot key
a 100 TB run will contain. ``sessionize_chunked`` removes that bound
with the standard two-phase trick: sessionize within (user, time-chunk)
windows, then merge sessions across chunk boundaries with one
boundary-gap pass over per-chunk summaries (rows per user = #chunks,
bounded by the time range, independent of event count). The two are
property-tested equal, including sessions straddling chunk boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ts_double(ts_col: str):
    # NTZ sources cast through the session zone (pinned UTC in
    # session.py) — a naive timestamp cannot cast to double directly.
    # try_cast, not cast: the session runs ANSI mode, where one
    # malformed string timestamp would THROW and fail the whole job;
    # the documented null-ts handling downstream expects NULL instead
    # (review finding, verified)
    return F.expr(f"try_cast(`{ts_col}` as timestamp)").cast("double")


def sessionize(events: DataFrame, gap_s: int = 1800,
               user_col: str = "user_id", ts_col: str = "ts",
               order_tiebreak: str = "event_id") -> DataFrame:
    """Events + per-event session index: ``session_idx`` numbers a
    user's sessions 0,1,2,... in time order. Ties on the timestamp
    break by ``order_tiebreak`` so numbering is deterministic.

    The window orders by the SAME casted-timestamp expression the gap
    uses — ordering by the raw column would mis-number sessions for
    string timestamps whose lexicographic order differs from
    chronological (non-zero-padded / mixed formats).
    """
    t = _ts_double(ts_col)
    w = Window.partitionBy(user_col).orderBy(t, order_tiebreak)
    prev = F.lag(t).over(w)
    # two steps: a window function can't nest inside another window's
    # aggregate in one projection
    marked = events.withColumn(
        "_new_session",
        F.when(prev.isNull() | (t - prev > gap_s), 1).otherwise(0))
    run = Window.partitionBy(user_col).orderBy(t, order_tiebreak) \
                .rowsBetween(Window.unboundedPreceding, 0)
    return (marked.withColumn(
        "session_idx",
        (F.sum("_new_session").over(run) - 1).cast("long"))
        .drop("_new_session"))


def sessionize_chunked(events: DataFrame, gap_s: int = 1800,
                       chunk_s: int = 86_400,
                       user_col: str = "user_id", ts_col: str = "ts",
                       order_tiebreak: str = "event_id") -> DataFrame:
    """``sessionize`` without the whole-history-per-user task bound.

    Phase 1 sessionizes within (user, ``chunk_s``-second time chunk)
    windows — a hot key's task now holds one chunk of its events, not
    all of them. Phase 2 runs on ONE ROW PER (user, chunk): a chunk's
    first local session merges into the previous chunk's last session
    iff the boundary gap ≤ ``gap_s`` (empty chunks in between simply
    don't appear, so the boundary gap is computed between the adjacent
    non-empty chunks, exactly like the single-pass lag). With m_k local
    sessions and merge flag g_k, the chunk contributes n_k = m_k - g_k
    new sessions; an exclusive running sum S_k of n_j gives the global
    index = S_k + local_idx - g_k (a session spanning several chunks
    chains through n_k = 0 chunks unchanged). Output equals
    ``sessionize`` row-for-row.
    """
    t = _ts_double(ts_col)
    # NULL timestamps: the single-pass window sorts them first (each
    # null row its own session — prev lag is null every time); routing
    # them to a dedicated lowest-ordered chunk reproduces that exactly
    # (floor(null) would otherwise make a null chunk whose ordering vs
    # real chunks is undefined)
    null_chunk = F.lit(-(1 << 60)).cast("long")
    ev = events.withColumn("_t", t) \
               .withColumn("_chunk",
                           F.when(t.isNull(), null_chunk)
                            .otherwise(F.floor(F.col("_t") / chunk_s)))
    w = Window.partitionBy(user_col, "_chunk").orderBy("_t", order_tiebreak)
    prev = F.lag("_t").over(w)
    marked = ev.withColumn(
        "_new", F.when(prev.isNull() | (F.col("_t") - prev > gap_s), 1)
                 .otherwise(0))
    run = Window.partitionBy(user_col, "_chunk") \
                .orderBy("_t", order_tiebreak) \
                .rowsBetween(Window.unboundedPreceding, 0)
    local = marked.withColumn("_lidx", F.sum("_new").over(run) - 1)
    summ = (local.groupBy(user_col, "_chunk")
            .agg(F.min("_t").alias("_first_t"),
                 F.max("_t").alias("_last_t"),
                 (F.max("_lidx") + 1).alias("_m")))
    cw = Window.partitionBy(user_col).orderBy("_chunk")
    prev_last = F.lag("_last_t").over(cw)
    merged = summ.withColumn(
        "_merge",
        F.when(prev_last.isNotNull()
               & (F.col("_first_t") - prev_last <= gap_s), 1).otherwise(0))
    off_w = Window.partitionBy(user_col).orderBy("_chunk") \
                  .rowsBetween(Window.unboundedPreceding, -1)
    offsets = merged.withColumn(
        "_S", F.coalesce(F.sum(F.col("_m") - F.col("_merge")).over(off_w),
                         F.lit(0)))
    return (local.join(offsets.select(user_col, "_chunk", "_S", "_merge"),
                       [user_col, "_chunk"])
            .withColumn("session_idx",
                        (F.col("_S") + F.col("_lidx") - F.col("_merge"))
                        .cast("long"))
            .drop("_t", "_chunk", "_new", "_lidx", "_S", "_merge"))


def session_stats(events: DataFrame, gap_s: int = 1800,
                  user_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  order_tiebreak: str = "event_id",
                  chunked: bool = False, chunk_s: int = 86_400) -> DataFrame:
    """One row per (user, session): event count, wall duration in
    seconds, summed value. The groupBy reuses the window's
    (user) partitioning — AQE sees an already-partitioned child.
    ``chunked=True`` routes through ``sessionize_chunked`` (same
    result; no whole-history-per-user task)."""
    if chunked:
        s = sessionize_chunked(events, gap_s, chunk_s, user_col, ts_col,
                               order_tiebreak)
    else:
        s = sessionize(events, gap_s, user_col, ts_col, order_tiebreak)
    t = _ts_double(ts_col)
    return (s.groupBy(user_col, "session_idx")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.round(F.max(t) - F.min(t), 6).alias("duration_s"),
                 F.round(F.sum(value_col), 2).alias("total_value")))
